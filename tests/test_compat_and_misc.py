"""Reference-compat and small-surface tests: index_dicts.txt loading,
EarlyStopping semantics, bf16 serving engine."""
import numpy as np
import jax
import pytest

from inpaintnet_tpu.data.tokenizer import Vocabulary
from inpaintnet_tpu.train.trainer import EarlyStopping


def test_load_reference_index_dicts(tmp_path):
    """Reference dicts are two repr'd lines: [index2note...] then
    [note2index...] (folk_dataset.py:425-429)."""
    index2note = {0: "C4", 1: "D4", 2: "__", 3: "START", 4: "END", 5: "rest"}
    note2index = {v: k for k, v in index2note.items()}
    p = tmp_path / "index_dicts.txt"
    with open(p, "w") as f:
        f.write("%s\n" % [index2note])
        f.write("%s\n" % [note2index])
    v = Vocabulary.load_reference_dicts(str(p))
    assert len(v) == 6
    assert v.index("C4") == 0
    assert v.slur_index == 2
    assert v.start_index == 3
    assert v.token(5) == "rest"


def test_early_stopping_reference_semantics():
    """(utils/trainer.py:379-413): patience 5; no-improvement AND
    sub-1e-5 improvements both count toward patience."""
    es = EarlyStopping(patience=3)
    es(1.0)
    es(1.1)  # worse -> counter 1
    es(1.05)  # worse than best -> counter 2
    assert not es.early_stop
    es(1.2)  # counter 3 -> stop
    assert es.early_stop

    es2 = EarlyStopping(patience=2)
    es2(1.0)
    es2(1.0 - 1e-7)  # improvement below 1e-5 still counts -> counter 1
    es2(1.0 - 2e-7)  # counter 2 -> stop
    assert es2.early_stop

    es3 = EarlyStopping(patience=2)
    es3(1.0)
    es3(0.5)  # real improvement resets
    es3(0.51)
    es3(0.52)
    assert es3.early_stop
    assert es3.val_loss_min == 0.5


def test_serve_engine_bf16():
    from inpaintnet_tpu.models import LatentRNN, MeasureVAE
    from inpaintnet_tpu.serve import InpaintingEngine

    class _DS:
        note2index_dicts = [{f"t{i}": i for i in range(30)}]

        def __repr__(self):
            return "ds"

    vae = MeasureVAE(_DS(), note_embedding_dim=8, num_encoder_layers=2,
                     encoder_hidden_size=16, latent_space_dim=12,
                     num_decoder_layers=2, decoder_hidden_size=16)
    vae.init(jax.random.PRNGKey(0))
    m = LatentRNN(_DS(), vae, num_rnn_layers=2, rnn_hidden_size=16,
                  dropout=0.5, auto_reg=False)
    m.init(jax.random.PRNGKey(1))
    engine = InpaintingEngine(m, batch_buckets=(2,), dtype="bfloat16")
    tokens = np.random.RandomState(0).randint(0, 30, (2, 16, 24)).astype(np.int32)
    out = engine.inpaint(tokens, start_measure=4, num_measures=3, seed=0)
    np.testing.assert_array_equal(out[:, :4], tokens[:, :4])
    np.testing.assert_array_equal(out[:, 7:], tokens[:, 7:])
    assert out.min() >= 0 and out.max() < 30


def test_crossentropy_runs_in_f32_under_bf16_logits():
    """Mixed precision keeps the CE/softmax pipeline in float32: bf16
    logits must yield a float32 loss identical (to f32 roundoff) to the
    f32 CE over the same quantized inputs, and strictly more accurate
    than an all-bf16 CE (which buckets the loss near convergence)."""
    import jax.numpy as jnp
    from inpaintnet_tpu.train.metrics import mean_crossentropy_loss

    rng = np.random.RandomState(0)
    # near-convergence regime: confident (large, ReLU'd) logits
    logits = (rng.rand(64, 24, 40) * 12).astype(np.float32)
    targets = jnp.asarray(rng.randint(0, 40, (64, 24)))
    lo_bf16 = jnp.asarray(logits).astype(jnp.bfloat16)

    loss = mean_crossentropy_loss(lo_bf16, targets)
    assert loss.dtype == jnp.float32
    ref = mean_crossentropy_loss(lo_bf16.astype(jnp.float32), targets)
    assert abs(float(loss) - float(ref)) < 1e-6

    # the old all-bf16 pipeline deviates measurably from the f32 value
    logp16 = jax.nn.log_softmax(lo_bf16, axis=-1)
    nll16 = -jnp.take_along_axis(logp16, targets[..., None], axis=-1)[..., 0]
    assert abs(float(nll16.mean()) - float(ref)) > abs(float(loss) - float(ref))
