"""Serving engine + debug/profiling utility tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inpaintnet_tpu.models import LatentRNN, MeasureVAE
from inpaintnet_tpu.serve import InpaintingEngine
from inpaintnet_tpu.utils.debug import assert_finite, checkify_wrap, nan_check
from inpaintnet_tpu.utils.profiling import StepTimer


class _FakeDataset:
    def __init__(self, vocab_size=30):
        self.note2index_dicts = [{f"t{i}": i for i in range(vocab_size)}]

    def __repr__(self):
        return "FakeDataset(test)"


V = 30


@pytest.fixture(scope="module")
def engine():
    vae = MeasureVAE(
        _FakeDataset(V), note_embedding_dim=8, num_encoder_layers=2,
        encoder_hidden_size=16, latent_space_dim=12, num_decoder_layers=2,
        decoder_hidden_size=16,
    )
    vae.init(jax.random.PRNGKey(0))
    m = LatentRNN(_FakeDataset(V), vae, num_rnn_layers=2, rnn_hidden_size=16,
                  dropout=0.5, auto_reg=False)
    m.init(jax.random.PRNGKey(1))
    # float32 serving on CPU test backend
    return InpaintingEngine(m, batch_buckets=(1, 4), dtype="float32")


def test_engine_inpaints_span_only(engine):
    tokens = np.random.RandomState(0).randint(0, V, (2, 16, 24)).astype(np.int32)
    out = engine.inpaint(tokens, start_measure=8, num_measures=2, seed=0)
    assert out.shape == tokens.shape
    np.testing.assert_array_equal(out[:, :8], tokens[:, :8])
    np.testing.assert_array_equal(out[:, 10:], tokens[:, 10:])
    assert out.min() >= 0 and out.max() < V


def test_engine_bucketing_compiles_once(engine):
    tokens = np.random.RandomState(1).randint(0, V, (3, 16, 24)).astype(np.int32)
    engine.inpaint(tokens, 4, 3)
    engine.inpaint(tokens[:2], 2, 1)  # same bucket (4)
    assert list(engine._compiled.keys()) == [4]
    engine.inpaint(tokens[:1], 2, 1)  # bucket 1
    assert sorted(engine._compiled.keys()) == [1, 4]


def test_engine_tick_api(engine):
    score = np.random.RandomState(2).randint(0, V, (1, 16 * 24)).astype(np.int32)
    out = engine.inpaint_ticks(score, (24 * 7, 24 * 9), seed=1)
    assert out.shape == score.shape
    np.testing.assert_array_equal(out[0, : 24 * 7], score[0, : 24 * 7])


def test_nan_check():
    good = {"a": jnp.ones((3,)), "b": [jnp.zeros((2, 2))]}
    nan_check(good)
    bad = {"a": jnp.array([1.0, np.nan])}
    with pytest.raises(ValueError, match="a"):
        nan_check(bad)
    with pytest.raises(ValueError):
        assert_finite(bad)


def test_checkify_wrap():
    def f(x):
        return jnp.log(x)

    wrapped = checkify_wrap(f)
    err, out = wrapped(jnp.array([-1.0]))
    with pytest.raises(Exception):
        err.throw()
    err2, out2 = wrapped(jnp.array([1.0]))
    err2.throw()  # no error


def test_step_timer():
    t = StepTimer(items_per_step=10, warmup=1)
    for _ in range(5):
        with t:
            pass
    assert t.throughput > 0
    assert "steps" in t.report()


def test_inpaint_variations_share_context(engine):
    """Encode-once variations: same context tokens preserved in every
    variation, variations differ, and each matches the static layout."""
    import numpy as np

    tokens = np.random.RandomState(1).randint(0, V, (2, 16, 24)).astype(np.int32)
    out = engine.inpaint_variations(tokens, start_measure=4, num_measures=2,
                                    num_variations=3, seed=11)
    assert out.shape == (3,) + tokens.shape
    for v in range(3):
        np.testing.assert_array_equal(out[v][:, :4], tokens[:, :4])
        np.testing.assert_array_equal(out[v][:, 6:], tokens[:, 6:])
    assert not np.array_equal(out[0], out[1]) or not np.array_equal(out[1], out[2])
    # deterministic under a fixed seed
    again = engine.inpaint_variations(tokens, start_measure=4, num_measures=2,
                                      num_variations=3, seed=11)
    np.testing.assert_array_equal(out, again)


def test_generate_from_context_dists_matches_apply_distribution():
    """The cached-posterior generation path produces valid outputs of the
    same shape/support as the fused apply (distribution-level check)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from inpaintnet_tpu.models.latent_rnn import LatentRNN
    from inpaintnet_tpu.models.measure_vae import MeasureVAE

    class _DS:
        note2index_dicts = [{f"t{i}": i for i in range(30)}]

        def __repr__(self):
            return "ds"

    vae = MeasureVAE(_DS(), note_embedding_dim=8, num_encoder_layers=2,
                     encoder_hidden_size=16, latent_space_dim=12,
                     num_decoder_layers=2, decoder_hidden_size=16)
    vae.init(jax.random.PRNGKey(0))
    m = LatentRNN(_DS(), vae, num_rnn_layers=2, rnn_hidden_size=16,
                  dropout=0.5, auto_reg=False, max_target=4)
    m.init(jax.random.PRNGKey(1))
    B = 3
    past = jax.random.randint(jax.random.PRNGKey(2), (B, 5, 24), 0, 30)
    future = jax.random.randint(jax.random.PRNGKey(3), (B, 6, 24), 0, 30)
    pm, fm = jnp.ones((B, 5)), jnp.ones((B, 6))
    tm = jnp.ones((B, 4))
    pd, fd = m.encode_context_dists(vae.params, past, future)
    assert pd[0].shape == (B, 5, 12) and fd[1].shape == (B, 6, 12)
    w, s, z = m.generate_from_context_dists(
        m.params, vae.params, pd, fd, past_mask=pm, future_mask=fm,
        target_mask=tm, rng=jax.random.PRNGKey(4),
    )
    assert w.shape == (B, 4, 24, 30) and s.shape == (B, 4, 24)
    assert int(jnp.max(s)) < 30
    # different rng -> different variation
    _, s2, _ = m.generate_from_context_dists(
        m.params, vae.params, pd, fd, past_mask=pm, future_mask=fm,
        target_mask=tm, rng=jax.random.PRNGKey(5),
    )
    assert not bool(jnp.all(s == s2))
    # autoregressive config refuses (it must re-encode its own samples)
    m_ar = LatentRNN(_DS(), vae, num_rnn_layers=2, rnn_hidden_size=16,
                     dropout=0.5, auto_reg=True, max_target=4)
    m_ar.init(jax.random.PRNGKey(6))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        m_ar.generate_from_context_dists(
            m_ar.params, vae.params, pd, fd, past_mask=pm, future_mask=fm,
            target_mask=tm, rng=jax.random.PRNGKey(7),
        )


def test_engine_int8_dtype(monkeypatch):
    """dtype="int8" routes the engine through the quantized kernels
    (interpret mode on CPU) and produces valid, near-f32 output."""
    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    from inpaintnet_tpu.models import measure_vae as mv

    vae = MeasureVAE(
        _FakeDataset(V), note_embedding_dim=8, num_encoder_layers=2,
        encoder_hidden_size=16, latent_space_dim=12, num_decoder_layers=2,
        decoder_hidden_size=16, encoder_dropout_prob=0.0,
        decoder_dropout_prob=0.0,
    )
    vae.init(jax.random.PRNGKey(0))
    m = LatentRNN(_FakeDataset(V), vae, num_rnn_layers=2, rnn_hidden_size=16,
                  dropout=0.0, auto_reg=False)
    m.init(jax.random.PRNGKey(1))
    # open the kernel gates on the CPU test backend
    monkeypatch.setattr(mv.Encoder, "_use_pallas", lambda self, p: True)
    monkeypatch.setattr(
        mv.HierarchicalDecoder, "_use_pallas_decode", lambda self, p: True
    )
    # spy: the quantized kernels must actually be traced
    from inpaintnet_tpu.ops import decode_pallas as dp_mod
    from inpaintnet_tpu.ops import encoder_pallas as ep_mod

    called = set()
    orig_enc, orig_dec = (ep_mod.encoder_hn_pallas_int8,
                          dp_mod.decode_sampling_pallas_int8)
    monkeypatch.setattr(
        ep_mod, "encoder_hn_pallas_int8",
        lambda *a, **k: called.add("enc") or orig_enc(*a, **k),
    )
    monkeypatch.setattr(
        dp_mod, "decode_sampling_pallas_int8",
        lambda *a, **k: called.add("dec") or orig_dec(*a, **k),
    )
    eng_q = InpaintingEngine(m, batch_buckets=(2,), dtype="int8")
    tokens = np.random.RandomState(3).randint(0, V, (2, 16, 24)).astype(np.int32)
    out_q = eng_q.inpaint(tokens, start_measure=8, num_measures=2, seed=5)
    assert called == {"enc", "dec"}
    # context untouched, tokens valid, deterministic per seed
    np.testing.assert_array_equal(out_q[:, :8], tokens[:, :8])
    assert out_q.min() >= 0 and out_q.max() < V
    np.testing.assert_array_equal(
        out_q, eng_q.inpaint(tokens, start_measure=8, num_measures=2, seed=5)
    )
    # the engine-level serving_quant scope must not leak process-wide
    from inpaintnet_tpu.ops.quantize import serve_quant_mode

    assert serve_quant_mode() == "none"
    # NOTE: cross-config token agreement is only meaningful on TRAINED
    # weights (random-init logits are near-flat, so any numeric change
    # flips most argmax ties) — benchmarks/quality_check.py measures it
    # at 97% with accuracy identical to f32.


def test_engine_warmup_precompiles_buckets(engine):
    """warmup() compiles every bucket ahead of the first real request."""
    eng = InpaintingEngine(engine.model, batch_buckets=(1, 4), dtype="float32")
    assert eng._compiled == {}
    eng.warmup()
    assert sorted(k for k in eng._compiled if isinstance(k, int)) == [1, 4]
    # a subsequent request reuses the compiled bucket
    tokens = np.random.RandomState(5).randint(0, V, (3, 16, 24)).astype(np.int32)
    out = eng.inpaint(tokens, start_measure=4, num_measures=2, seed=1)
    assert out.shape == tokens.shape


def test_engine_warmup_covers_variations(engine):
    """warmup() pre-compiles the inpaint_variations enc/gen programs too:
    the first real variations call must hit the jit caches, not compile."""
    eng = InpaintingEngine(engine.model, batch_buckets=(4,), dtype="float32")
    eng.warmup()
    assert "enc_dists" in eng._compiled and "gen_dists" in eng._compiled
    enc_n = eng._compiled["enc_dists"]._cache_size()
    gen_n = eng._compiled["gen_dists"]._cache_size()
    tokens = np.random.RandomState(6).randint(0, V, (4, 16, 24)).astype(np.int32)
    out = eng.inpaint_variations(tokens, start_measure=4, num_measures=2,
                                 num_variations=2, seed=3)
    assert out.shape == (2,) + tokens.shape
    assert eng._compiled["enc_dists"]._cache_size() == enc_n
    assert eng._compiled["gen_dists"]._cache_size() == gen_n


def test_engine_chunk_keys_fold_in(engine):
    """Chunk PRNG keys are derived via fold_in on the base key — integer
    arithmetic on the seed could collide with another request's plain
    seed (identical streams across supposedly independent requests)."""
    recorded = []
    engine._run_chunked(
        lambda lo, hi, k: recorded.append((lo, hi, k)) or
        np.zeros((hi - lo, 1)), 9, 5,
    )
    assert [(lo, hi) for lo, hi, _ in recorded] == [(0, 4), (4, 8), (8, 9)]
    base = jax.random.PRNGKey(5)
    for c, (_, _, key) in enumerate(recorded):
        np.testing.assert_array_equal(
            np.asarray(key), np.asarray(jax.random.fold_in(base, c))
        )


def test_engine_mesh_rejects_nondividing_buckets(engine, devices8):
    """A bucket that doesn't divide the mesh data axis fails fast at
    construction with a clear message, not later inside shard_map."""
    from inpaintnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_devices=8)
    with pytest.raises(ValueError, match="data"):
        InpaintingEngine(engine.model, batch_buckets=(1, 8),
                         dtype="float32", mesh=mesh)


def test_engine_mesh_sharded_serving(engine, devices8):
    """Data-parallel serving via shard_map: each shard's tokens EXACTLY
    equal a single-device run on that shard's rows with the shard-folded
    key (the per-shard program is the same computation), shards are
    rng-DEcorrelated, and the request arrays are actually sharded.
    shard_map (not GSPMD) is load-bearing: on TPU the Pallas kernels
    lower to custom calls XLA cannot partition."""
    import jax
    from jax.sharding import PartitionSpec as P

    from inpaintnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_devices=8)
    eng_mesh = InpaintingEngine(
        engine.model, batch_buckets=(8,), dtype="float32", mesh=mesh
    )
    eng_single = InpaintingEngine(
        engine.model, batch_buckets=(1,), dtype="float32"
    )
    # 8 IDENTICAL rows, one per shard: rng decorrelation must make the
    # generated spans differ across shards (a replicated key would make
    # them all identical)
    one = np.random.RandomState(9).randint(0, V, (1, 16, 24)).astype(np.int32)
    tokens = np.repeat(one, 8, axis=0)
    out = eng_mesh.inpaint(tokens, start_measure=8, num_measures=2, seed=3)
    assert out.shape == tokens.shape
    np.testing.assert_array_equal(out[:, :8], tokens[:, :8])
    spans = out[:, 8:10]
    assert len({s.tobytes() for s in spans}) > 1, "shards correlated"
    # per-shard exactness: shard i == single-device run on its row with
    # the shard-folded key
    base = jax.random.PRNGKey(3)
    fn = eng_single._compiled_for(1)[1]
    import jax as _jax

    for i in (0, 3, 7):
        _, past, pm, future, fm, tm = eng_single._pack_request(
            tokens[i : i + 1], 8, 2, 1
        )
        expected = np.asarray(_jax.jit(fn)(
            eng_single._params, eng_single._vae_params, past, pm, future,
            fm, tm, jax.random.fold_in(base, i),
        ))
        np.testing.assert_array_equal(spans[i], expected[0, :2])
    # the placed batch really is sharded over the data axis
    placed = eng_mesh._place_batch((tokens.astype(np.int32),))[0]
    assert placed.sharding.spec == P("data")
    assert len({sh.device for sh in placed.addressable_shards}) == 8
    # variations work sharded too, deterministically
    v1 = eng_mesh.inpaint_variations(tokens, 4, 2, num_variations=2, seed=7)
    v2 = eng_mesh.inpaint_variations(tokens, 4, 2, num_variations=2, seed=7)
    np.testing.assert_array_equal(v1, v2)


def test_engine_chunks_oversized_batches(engine):
    """A batch bigger than the largest bucket is processed in chunks and
    stitched back (previously a broadcast error)."""
    tokens = np.random.RandomState(12).randint(0, V, (9, 16, 24)).astype(np.int32)
    out = engine.inpaint(tokens, start_measure=8, num_measures=2, seed=2)
    assert out.shape == tokens.shape
    np.testing.assert_array_equal(out[:, :8], tokens[:, :8])
    v = engine.inpaint_variations(tokens, 4, 2, num_variations=2, seed=2)
    assert v.shape == (2,) + tokens.shape
    np.testing.assert_array_equal(v[0][:, :4], tokens[:, :4])


def test_engine_mesh_with_pallas_kernels(engine, devices8, monkeypatch):
    """The Pallas kernel routes compose with shard_map (interpret mode on
    CPU): a meshed int8 engine traces the kernels per shard and serves."""
    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    from inpaintnet_tpu.models import measure_vae as mv
    from inpaintnet_tpu.ops import decode_pallas as dp_mod
    from inpaintnet_tpu.parallel.mesh import make_mesh

    monkeypatch.setattr(mv.Encoder, "_use_pallas", lambda self, p: True)
    monkeypatch.setattr(
        mv.HierarchicalDecoder, "_use_pallas_decode", lambda self, p: True
    )
    called = []
    orig = dp_mod.decode_sampling_pallas_int8
    monkeypatch.setattr(
        dp_mod, "decode_sampling_pallas_int8",
        lambda *a, **k: called.append(1) or orig(*a, **k),
    )
    mesh = make_mesh(num_devices=8)
    eng = InpaintingEngine(
        engine.model, batch_buckets=(8,), dtype="int8", mesh=mesh
    )
    tokens = np.random.RandomState(4).randint(0, V, (8, 16, 24)).astype(np.int32)
    out = eng.inpaint(tokens, start_measure=8, num_measures=2, seed=1)
    assert called, "int8 kernel not traced under shard_map"
    assert out.shape == tokens.shape
    np.testing.assert_array_equal(out[:, :8], tokens[:, :8])
    assert out.min() >= 0 and out.max() < V
