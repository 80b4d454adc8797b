"""AnticipationRNN serving engine (serve_arnn.py) + its HTTP route."""
import http.client
import json

import jax
import numpy as np
import pytest

from inpaintnet_tpu.data.metadata import BeatMarkerMetadata, TickMetadata
from inpaintnet_tpu.models.anticipation_rnn import AnticipationRNNBaseline
from inpaintnet_tpu.serve_arnn import ARNNServingEngine

V = 30


class _DS:
    def __init__(self):
        self.note2index_dicts = [{f"t{i}": i for i in range(V)}]
        self.metadatas = [BeatMarkerMetadata(), TickMetadata()]
        self.num_voices = 1

    def __repr__(self):
        return "ds"


@pytest.fixture(scope="module")
def engine():
    m = AnticipationRNNBaseline(
        _DS(), note_embedding_dim=8, metadata_embedding_dim=4,
        num_lstm_constraints_units=16, num_lstm_generation_units=16,
        linear_hidden_size=12, num_layers=2, unary_constraint=True,
    )
    m.init(jax.random.PRNGKey(0))
    return ARNNServingEngine(m, batch_buckets=(4,), dtype="float32")


def _toks(b, m, seed):
    return np.random.RandomState(seed).randint(0, V, (b, m, 24)).astype(
        np.int32
    )


def test_arnn_inpaint_span_only_and_deterministic(engine):
    toks = _toks(2, 8, 0)
    out = engine.inpaint(toks, start_measure=3, num_measures=2)
    assert out.shape == toks.shape
    np.testing.assert_array_equal(out[:, :3], toks[:, :3])
    np.testing.assert_array_equal(out[:, 5:], toks[:, 5:])
    assert out.min() >= 0 and out.max() < V
    # argmax decode: fully deterministic, seed-independent
    np.testing.assert_array_equal(
        out, engine.inpaint(toks, 3, 2, seed=123)
    )


def test_arnn_per_row_spans(engine):
    """constraints_loc is per-row: heterogeneous spans in one batch match
    the homogeneous runs row for row (argmax decode is row-independent)."""
    toks = _toks(2, 8, 1)
    het = engine.inpaint(toks, start_measure=[2, 4], num_measures=[3, 1])
    solo0 = engine.inpaint(toks[:1], 2, 3)
    solo1 = engine.inpaint(toks[1:], 4, 1)
    np.testing.assert_array_equal(het[0], solo0[0])
    np.testing.assert_array_equal(het[1], solo1[0])


def test_arnn_temperature_sampling(engine):
    toks = _toks(1, 8, 2)
    a = engine.inpaint(toks, 3, 2, seed=1, temperature=1.5)
    b = engine.inpaint(toks, 3, 2, seed=1, temperature=1.5)
    c = engine.inpaint(toks, 3, 2, seed=2, temperature=1.5)
    np.testing.assert_array_equal(a, b)  # seeded => reproducible
    assert not np.array_equal(a, c)      # different seed => different span
    np.testing.assert_array_equal(a[:, :3], toks[:, :3])  # context forced
    # the temperature VALUE is traced, not compiled in: every temperature
    # shares ONE sampled program per (bucket, length) — a per-value
    # compile would let clients force unbounded recompiles
    n_compiled = len(engine._compiled)
    engine.inpaint(toks, 3, 2, seed=1, temperature=0.7)
    engine.inpaint(toks, 3, 2, seed=1, temperature=2.5)
    assert len(engine._compiled) == n_compiled


def test_arnn_request_caps(engine):
    # sequence length is capped: programs compile per length, so an
    # uncapped M would let one request force an arbitrarily large scan
    # compile
    with pytest.raises(AssertionError, match="max_measures"):
        engine.inpaint(_toks(1, 17, 0), 3, 2)
    # out-of-vocab tokens rejected before the int16 wire narrowing
    bad = _toks(1, 8, 0)
    bad[0, 0, 0] = V + 5
    with pytest.raises(AssertionError, match="token values"):
        engine.inpaint(bad, 3, 2)


def test_arnn_metadata_matches_dataset_layout(engine):
    md = engine._metadata(48)
    assert md.shape == (48, 3)  # beatmarker, tick, voice-id
    mds = engine.model.dataset.metadatas
    np.testing.assert_array_equal(md[:, 0], mds[0].generate(48))
    np.testing.assert_array_equal(md[:, 1], mds[1].generate(48))
    np.testing.assert_array_equal(md[:, 2], 0)


def test_arnn_oversized_batch_chunks(engine):
    toks = _toks(6, 4, 3)  # > bucket 4
    out = engine.inpaint(toks, 1, 2)
    np.testing.assert_array_equal(out[:, :1], toks[:, :1])
    # chunking == one-shot per row (deterministic argmax)
    np.testing.assert_array_equal(out[:4], engine.inpaint(toks[:4], 1, 2))


def test_arnn_inpaint_hetero(engine):
    """Coalesced argmax requests (the ARNN batcher's primitive): bit-
    exact vs solo (no RNG anywhere in the argmax decode), MIXED lengths
    within a measure bucket (round 4 — per-row tick masks make the
    suffix padding exact), per-request spans."""
    reqs = [
        {"tokens": _toks(2, 8, 20), "start_measure": 3, "num_measures": 2},
        {"tokens": _toks(1, 8, 21), "start_measure": 5, "num_measures": 1},
        # 6 measures pads to the 8-bucket and coalesces with the others
        {"tokens": _toks(1, 6, 22), "start_measure": 2, "num_measures": 1},
    ]
    outs = engine.inpaint_hetero(reqs)
    for req, out in zip(reqs, outs):
        assert out.shape == req["tokens"].shape
        solo = engine.inpaint(req["tokens"], req["start_measure"],
                              req["num_measures"])
        np.testing.assert_array_equal(out, solo)
    # lengths spanning DIFFERENT measure buckets still refuse (the
    # server's batcher groups by bucket, so it never builds such a set)
    with pytest.raises(ValueError, match="measure bucket"):
        engine.inpaint_hetero([
            reqs[0],
            {"tokens": _toks(1, 3, 23), "start_measure": 1,
             "num_measures": 1},
        ])
    assert engine.inpaint_hetero([]) == []


def test_arnn_padded_equals_exact_length(engine):
    """THE mixed-length contract at the model level: a request padded to
    its measure bucket decodes exactly as an unpadded run of the same
    ticks — the masked reversed constraint scan holds zero state across
    the padded suffix, so every valid tick's constraint hidden (and thus
    the argmax decode) is unchanged."""
    import jax.numpy as jnp

    m = engine.model
    toks = _toks(2, 6, 30)
    total, pad_total = 6 * 24, 8 * 24
    md6 = np.asarray(engine._metadata(total))
    md8 = np.asarray(engine._metadata(pad_total))
    # metadata is positional: the 8-bucket metadata's prefix IS the
    # 6-measure metadata (the padding-prefix property the engine relies on)
    np.testing.assert_array_equal(md8[:total], md6)
    score6 = jnp.asarray(toks.reshape(2, total))
    score8 = jnp.concatenate(
        [score6, jnp.zeros((2, pad_total - total), jnp.int32)], axis=1
    )
    tick = np.arange(pad_total)
    loc6 = ((tick[:total] < 2 * 24) | (tick[:total] >= 4 * 24))[None]
    loc8 = ((tick < 2 * 24) | (tick >= 4 * 24))[None]
    mask8 = (tick < total)[None]
    b6 = jnp.broadcast_to(jnp.asarray(md6)[None], (2,) + md6.shape)
    b8 = jnp.broadcast_to(jnp.asarray(md8)[None], (2,) + md8.shape)
    logits6, tokens6 = m.apply_inpaint(
        m.params, score6, b6, jnp.asarray(loc6.astype(np.int32)),
        train=False, rng=jax.random.PRNGKey(0),
    )
    logits8, tokens8 = m.apply_inpaint(
        m.params, score8, b8, jnp.asarray(loc8.astype(np.int32)),
        train=False, rng=jax.random.PRNGKey(0),
        tick_mask=jnp.broadcast_to(
            jnp.asarray(mask8.astype(np.int32)), (2, pad_total)
        ),
    )
    np.testing.assert_allclose(
        np.asarray(logits8)[:, :total], np.asarray(logits6),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(tokens8)[:, :total], np.asarray(tokens6)
    )


def test_arnn_sampled_hetero(engine):
    """Sampled requests coalesce too: per-row temperature vectors and
    per-row (seed, row)-derived keys make a request's tokens identical
    solo vs coalesced — whatever temperatures/seeds its co-travellers
    use."""
    reqs = [
        {"tokens": _toks(2, 8, 50), "start_measure": 3, "num_measures": 2,
         "temperature": 1.5, "seed": 7},
        {"tokens": _toks(1, 8, 51), "start_measure": 5, "num_measures": 1,
         "temperature": 0.7, "seed": 8},
    ]
    outs = engine.inpaint_hetero(reqs, bucket=4)
    for req, out in zip(reqs, outs):
        solo = engine.inpaint(req["tokens"], req["start_measure"],
                              req["num_measures"], seed=req["seed"],
                              temperature=req["temperature"], bucket=4)
        np.testing.assert_array_equal(out, solo)
    # different temperatures genuinely take effect per row: same seed,
    # different temperature => different span content (with overwhelming
    # probability over a 2-measure span)
    hot = engine.inpaint(reqs[0]["tokens"], 3, 2, seed=7, temperature=5.0,
                         bucket=4)
    assert not np.array_equal(outs[0], hot)
    # decode kinds don't mix (argmax and sampled are different programs)
    with pytest.raises(ValueError, match="decode kind"):
        engine.inpaint_hetero([
            reqs[0],
            {"tokens": _toks(1, 8, 52), "start_measure": 2,
             "num_measures": 1},
        ])


def test_arnn_per_row_temperature_vector(engine):
    """engine.inpaint accepts a (B,) per-row temperature vector — each
    row samples at its own temperature, matching the row's solo run
    (at a pinned bucket; keys passed per row)."""
    from inpaintnet_tpu.serve import derive_row_keys

    toks = _toks(2, 8, 53)
    keys = derive_row_keys(11, 2)
    both = engine.inpaint(toks, 3, 2, temperature=np.array([1.5, 0.7]),
                          row_keys=keys, bucket=4)
    solo0 = engine.inpaint(toks[:1], 3, 2, temperature=1.5,
                           row_keys=keys[:1], bucket=4)
    solo1 = engine.inpaint(toks[1:], 3, 2, temperature=0.7,
                           row_keys=keys[1:], bucket=4)
    np.testing.assert_array_equal(both[0], solo0[0])
    np.testing.assert_array_equal(both[1], solo1[0])


def test_arnn_server_coalesces(engine):
    """Concurrent same-length argmax ARNN requests share one device
    batch; different-length and sampled requests get their own."""
    import threading

    from inpaintnet_tpu.models import LatentRNN, MeasureVAE
    from inpaintnet_tpu.serve import InpaintingEngine
    from inpaintnet_tpu.server import InpaintingServer

    vae = MeasureVAE(_DS(), note_embedding_dim=8, num_encoder_layers=1,
                     encoder_hidden_size=16, latent_space_dim=12,
                     num_decoder_layers=1, decoder_hidden_size=16)
    vae.init(jax.random.PRNGKey(0))
    lrnn = LatentRNN(_DS(), vae, num_rnn_layers=2, rnn_hidden_size=16,
                     dropout=0.5, auto_reg=False)
    lrnn.init(jax.random.PRNGKey(1))
    main_engine = InpaintingEngine(lrnn, batch_buckets=(4,),
                                   dtype="float32")
    srv = InpaintingServer(main_engine, port=0, batching=True,
                           max_wait_ms=1000, arnn_engine=engine)
    srv.start()
    try:
        # warm so the timed coalescing window isn't compile-bound
        engine.inpaint_hetero([{"tokens": _toks(1, 8, 0),
                                "start_measure": 2, "num_measures": 1}])
        reqs = [
            {"tokens": _toks(1, 8, 30), "start_measure": 3,
             "num_measures": 2},
            {"tokens": _toks(2, 8, 31), "start_measure": 5,
             "num_measures": 1},
        ]
        calls0 = srv._arnn_batcher.calls
        results = [None] * len(reqs)

        def post(i):
            conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                              timeout=120)
            conn.request("POST", "/v1/arnn/inpaint", body=json.dumps({
                "tokens": reqs[i]["tokens"].tolist(),
                "start_measure": reqs[i]["start_measure"],
                "num_measures": reqs[i]["num_measures"],
            }), headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            out = json.loads(resp.read())
            conn.close()
            assert resp.status == 200, out
            results[i] = np.asarray(out["tokens"])

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert srv._arnn_batcher.calls == calls0 + 1
        for req, got in zip(reqs, results):
            if got.ndim == 2:
                got = got[None]
            solo = engine.inpaint(req["tokens"], req["start_measure"],
                                  req["num_measures"])
            np.testing.assert_array_equal(got, solo)
        # sampled requests go through the batcher too (per-row keys +
        # per-row temperature — round-4 coalescing completion), in their
        # own group (different program from argmax), bit-equal to the
        # engine's solo sampled run
        stoks = _toks(1, 8, 32)
        conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                          timeout=120)
        conn.request("POST", "/v1/arnn/inpaint", body=json.dumps({
            "tokens": stoks[0].tolist(), "start_measure": 3,
            "num_measures": 2, "temperature": 1.5, "seed": 4,
        }), headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        out = json.loads(resp.read())
        conn.close()
        assert resp.status == 200, out
        assert srv._arnn_batcher.calls == calls0 + 2
        np.testing.assert_array_equal(
            np.asarray(out["tokens"]),
            engine.inpaint(stoks, 3, 2, seed=4, temperature=1.5)[0],
        )
    finally:
        srv.stop()


def test_arnn_pin_bucket(engine):
    """A pinned bucket runs solo and coalesced requests through the SAME
    executable (bit-identity across load — the multi-bucket caveat the
    LatentRNN engine documents applies here too)."""
    reqs = [
        {"tokens": _toks(1, 8, 40), "start_measure": 3, "num_measures": 2},
        {"tokens": _toks(2, 8, 41), "start_measure": 5, "num_measures": 1},
    ]
    solo = engine.inpaint_hetero([reqs[0]], bucket=4)[0]
    coal = engine.inpaint_hetero(reqs, bucket=4)[0]
    np.testing.assert_array_equal(solo, coal)
    # oversized batches chunk at the bucket ladder, each chunk still at
    # the pinned bucket (argmax rows are independent, so chunked rows
    # equal their solo runs)
    big = _toks(5, 8, 42)
    out = engine.inpaint_hetero([
        {"tokens": big, "start_measure": 3, "num_measures": 2}
    ], bucket=4)[0]
    np.testing.assert_array_equal(
        out[:1], engine.inpaint(big[:1], 3, 2, bucket=4)
    )


def test_arnn_http_route(engine):
    from inpaintnet_tpu.models import LatentRNN, MeasureVAE
    from inpaintnet_tpu.serve import InpaintingEngine
    from inpaintnet_tpu.server import InpaintingServer

    vae = MeasureVAE(_DS(), note_embedding_dim=8, num_encoder_layers=1,
                     encoder_hidden_size=16, latent_space_dim=12,
                     num_decoder_layers=1, decoder_hidden_size=16)
    vae.init(jax.random.PRNGKey(0))
    lrnn = LatentRNN(_DS(), vae, num_rnn_layers=2, rnn_hidden_size=16,
                     dropout=0.5, auto_reg=False)
    lrnn.init(jax.random.PRNGKey(1))
    main_engine = InpaintingEngine(lrnn, batch_buckets=(2,),
                                   dtype="float32")
    srv = InpaintingServer(main_engine, port=0, arnn_engine=engine)
    srv.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                          timeout=120)
        toks = _toks(1, 8, 5)
        conn.request("POST", "/v1/arnn/inpaint", body=json.dumps({
            "tokens": toks[0].tolist(), "start_measure": 3,
            "num_measures": 2,
        }), headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        out = json.loads(resp.read())
        assert resp.status == 200
        got = np.asarray(out["tokens"])
        np.testing.assert_array_equal(
            got, engine.inpaint(toks, 3, 2)[0]
        )
        # meta advertises the second family
        conn.request("GET", "/v1/meta")
        meta = json.loads(conn.getresponse().read())
        assert meta["arnn"]["model"] == "AnticipationRNNBaseline"
        # bad temperature -> 400
        conn.request("POST", "/v1/arnn/inpaint", body=json.dumps({
            "tokens": toks[0].tolist(), "start_measure": 3,
            "num_measures": 2, "temperature": -1,
        }), headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        # temperature=inf parses as a float and is > 0 but would produce
        # NaN logits — must 400, not sample garbage (JSON 1e999 -> inf)
        conn.request("POST", "/v1/arnn/inpaint", body=json.dumps({
            "tokens": toks[0].tolist(), "start_measure": 3,
            "num_measures": 2,
        })[:-1] + ', "temperature": 1e999}',
            headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        out = json.loads(resp.read())
        assert resp.status == 400 and "finite" in out["error"]
        conn.close()
        # client library, both transports (npy keeps float temperature)
        from inpaintnet_tpu.client import InpaintingClient

        for transport in ("npy", "json"):
            with InpaintingClient("127.0.0.1", srv.port,
                                  transport=transport) as c:
                np.testing.assert_array_equal(
                    c.arnn_inpaint(toks, 3, 2), engine.inpaint(toks, 3, 2)
                )
                t = c.arnn_inpaint(toks, 3, 2, seed=1, temperature=1.5)
                np.testing.assert_array_equal(
                    t, engine.inpaint(toks, 3, 2, seed=1, temperature=1.5)
                )
    finally:
        srv.stop()


def test_arnn_route_absent_without_engine():
    from inpaintnet_tpu.models import LatentRNN, MeasureVAE
    from inpaintnet_tpu.serve import InpaintingEngine
    from inpaintnet_tpu.server import InpaintingServer

    vae = MeasureVAE(_DS(), note_embedding_dim=8, num_encoder_layers=1,
                     encoder_hidden_size=16, latent_space_dim=12,
                     num_decoder_layers=1, decoder_hidden_size=16)
    vae.init(jax.random.PRNGKey(0))
    lrnn = LatentRNN(_DS(), vae, num_rnn_layers=2, rnn_hidden_size=16,
                     dropout=0.5, auto_reg=False)
    lrnn.init(jax.random.PRNGKey(1))
    srv = InpaintingServer(
        InpaintingEngine(lrnn, batch_buckets=(2,), dtype="float32"),
        port=0,
    )
    srv.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                          timeout=60)
        conn.request("POST", "/v1/arnn/inpaint", body=json.dumps({
            "tokens": np.zeros((8, 24), int).tolist(),
            "start_measure": 3, "num_measures": 2,
        }), headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        out = json.loads(resp.read())
        assert resp.status == 400 and "AnticipationRNN" in out["error"]
        conn.close()
    finally:
        srv.stop()
