"""Trained-weights serving quality harness.

Trains flagship-shaped models (2x512 bi-GRU MeasureVAE + LatentRNN) on a
synthetic corpus, then measures inpainting quality of every SERVING
configuration on a held-out batch — the check behind the quality table in
docs/PERFORMANCE.md. Run on the real TPU (CPU works but the kernel routes
gate off):

    python benchmarks/quality_check.py [workdir]

Configs compared (fresh trace per config so the trace-time env routing
takes effect):
- ``xla-f32``     — XLA scans, f32 (the reference numeric)
- ``pallas-bf16`` — the default serving path (fused kernels, bf16)
- ``pallas-int8`` — INPAINTNET_SERVE_QUANT=int8 (ops/quantize.py)

Metrics: generated-target token accuracy vs ground truth, and token
agreement vs the ``xla-f32`` decode (how much the numeric changes the
actual argmax decisions). The AnticipationRNN baseline family is
evaluated the same way (fixed 6/4/6 constraint span, f32 scan vs the
fused bf16 kernel). Training state is cached in the workdir; delete it
to retrain.

QUALITY GATE: when the harness runs at the flagship signature recorded
in ``benchmarks/quality_expected.json`` (the documented PERFORMANCE.md
configuration), every row is checked against stored bounds — absolute
f32 accuracy floors, per-config |accuracy - f32| deltas, and token-
agreement floors — and the process exits nonzero listing violations, so
kernel/serving changes cannot silently damage quality. ``QC_GATE=0``
disables; ``QC_GATE=1`` forces arming even off-signature (bounds were
chosen for the flagship signature, so expect false failures on tiny
smoke runs).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("INPAINTNET_FORCE_CPU"):
    # must precede backend init; the hosting TPU plugin overrides the
    # JAX_PLATFORMS env var (see cli/common.py)
    import jax

    jax.config.update("jax_platforms", "cpu")

WORKDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/inpaintnet_quality"

# All knobs env-overridable so the harness can smoke-run tiny on CPU
# (tests/test_cli_pipeline.py) as well as flagship on the chip.
VAE_EPOCHS = int(os.environ.get("QC_VAE_EPOCHS", "25"))
RNN_EPOCHS = int(os.environ.get("QC_RNN_EPOCHS", "6"))
HIDDEN = int(os.environ.get("QC_HIDDEN", "512"))
Z_DIM = int(os.environ.get("QC_Z", "256"))
NUM_TUNES = int(os.environ.get("QC_TUNES", "200"))
EVAL_BATCH = int(os.environ.get("QC_EVAL_BATCH", "512"))
VAE_BATCH = int(os.environ.get("QC_VAE_BATCH", "256"))
RNN_BATCH = int(os.environ.get("QC_RNN_BATCH", "32"))
ARNN_EPOCHS = int(os.environ.get("QC_ARNN_EPOCHS", "3"))
ARNN_HIDDEN = int(os.environ.get("QC_ARNN_HIDDEN", "256"))
# "uniform" (i.i.d. notes, saturates ~83%) or "structured" (phrase-form
# corpus with learnable long-range signal — the discriminative setting;
# see data/synthetic.py). Use a separate workdir per style: the corpus
# and checkpoints are cached.
STYLE = os.environ.get("QC_STYLE", "uniform")


def build_dataset():
    from inpaintnet_tpu.data import BeatMarkerMetadata, DatasetManager, TickMetadata
    from inpaintnet_tpu.data.synthetic import generate_corpus

    corpus = os.path.join(WORKDIR, "corpus")
    cache = os.path.join(WORKDIR, "cache")
    if not os.path.isdir(corpus):
        os.makedirs(corpus, exist_ok=True)
        generate_corpus(corpus, num_tunes=NUM_TUNES, num_bars=16, seed=7,
                        style=STYLE)
    mgr = DatasetManager(cache_dir=cache, corpus_dir=corpus)
    metadatas = [BeatMarkerMetadata(6), TickMetadata(6)]
    ds = mgr.get_dataset(
        "folk_4by4nbars_train", metadatas=metadatas, num_bars=16, train=True
    )
    ds.arrays
    return ds


def build_models(ds, ckpt_dir):
    import jax

    from inpaintnet_tpu.models import LatentRNN, MeasureVAE

    vae = MeasureVAE(
        dataset=ds, note_embedding_dim=10, num_encoder_layers=2,
        encoder_hidden_size=HIDDEN, encoder_dropout_prob=0.5,
        latent_space_dim=Z_DIM, num_decoder_layers=2,
        decoder_hidden_size=HIDDEN, decoder_dropout_prob=0.5,
        checkpoint_dir=ckpt_dir,
    )
    vae.init(jax.random.PRNGKey(0))
    model = LatentRNN(
        dataset=ds, vae_model=vae, num_rnn_layers=2, rnn_hidden_size=HIDDEN,
        dropout=0.5, auto_reg=False, teacher_forcing=True,
        checkpoint_dir=ckpt_dir,
    )
    model.init(jax.random.PRNGKey(1))
    return vae, model


def build_arnn(ds, ckpt_dir, cls):
    import jax

    m = cls(
        dataset=ds, note_embedding_dim=10, metadata_embedding_dim=2,
        num_lstm_constraints_units=ARNN_HIDDEN,
        num_lstm_generation_units=ARNN_HIDDEN,
        linear_hidden_size=ARNN_HIDDEN, num_layers=2,
        unary_constraint=True, checkpoint_dir=ckpt_dir,
    )
    m.init(jax.random.PRNGKey(4))
    return m


def train_arnn_if_needed(ds, model, trainer_cls):
    if os.path.exists(model.filepath):
        model.load()
        return
    t0 = time.time()
    tr = trainer_cls(ds, model, lr=1e-4, compute_dtype="bfloat16")
    tr.train_model(batch_size=RNN_BATCH, num_epochs=ARNN_EPOCHS, log=False)
    print(f"{type(model).__name__} trained in {time.time() - t0:.0f}s")


def eval_arnn_config(model, score, md, loc, dtype, env=None):
    """Masked-span generation accuracy under one ARNN serving config."""
    import jax
    import jax.numpy as jnp

    from inpaintnet_tpu.models.base import cast_pytree
    from inpaintnet_tpu.utils.timing import fetch

    saved = {}
    env = env or {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        params = model.params
        if dtype != "float32":
            params = cast_pytree(params, jnp.dtype(dtype))

        def fn(params, score, md, loc, key):
            _, gen = model.apply_inpaint(params, score, md, loc, rng=key)
            return gen

        out = jax.jit(fn)(params, score, md, loc, jax.random.PRNGKey(42))
        fetch(out)
        return np.asarray(out)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def train_if_needed(ds, vae, model):
    from inpaintnet_tpu.train import LatentRNNTrainer, VAETrainer

    if os.path.exists(model.filepath) and os.path.exists(vae.filepath):
        vae.load()
        model.load()
        print("loaded cached checkpoints from", os.path.dirname(vae.filepath))
        return
    t0 = time.time()
    vt = VAETrainer(ds, vae, lr=1e-4, compute_dtype="bfloat16")
    vt.train_model(batch_size=VAE_BATCH, num_epochs=VAE_EPOCHS, log=False)
    print(f"VAE trained in {time.time() - t0:.0f}s")
    t0 = time.time()
    rt = LatentRNNTrainer(ds, model, lr=1e-4, compute_dtype="bfloat16")
    rt.train_model(batch_size=RNN_BATCH, num_epochs=RNN_EPOCHS, log=False)
    print(f"LatentRNN trained in {time.time() - t0:.0f}s")


def eval_config(model, vae, batch_args, dtype, env=None, label=""):
    """Generated-target accuracy under one serving config (fresh trace)."""
    print(f"evaluating {label or dtype} ...", flush=True)
    import jax
    import jax.numpy as jnp

    from inpaintnet_tpu.models.base import cast_pytree
    from inpaintnet_tpu.utils.timing import fetch

    saved = {}
    env = env or {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        params, vae_params = model.params, vae.params
        if dtype != "float32":
            params = cast_pytree(params, jnp.dtype(dtype))
            vae_params = cast_pytree(vae_params, jnp.dtype(dtype))
        past, pm, future, fm, target, tm = batch_args

        # a fresh function object per config -> fresh jit cache -> the
        # trace re-reads the serving env routing
        def fn(params, vae_params, past, pm, future, fm, target, tm, key):
            w, samples, z = model.apply(
                params, vae_params, past, future, target,
                past_mask=pm, future_mask=fm, target_mask=tm,
                train=False, rng=key,
            )
            return samples

        jf = jax.jit(fn)
        key = jax.random.PRNGKey(42)  # same rsample draws for every config
        out = jf(params, vae_params, past, pm, future, fm, target, tm, key)
        fetch(out)
        return np.asarray(out)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def harness_signature():
    return (
        f"style={STYLE},tunes={NUM_TUNES},hidden={HIDDEN},z={Z_DIM},"
        f"arnn_hidden={ARNN_HIDDEN},vae_epochs={VAE_EPOCHS},"
        f"rnn_epochs={RNN_EPOCHS},arnn_epochs={ARNN_EPOCHS},"
        f"eval_batch={EVAL_BATCH}"
    )


def run_gate(metrics):
    """Check collected {family: {label: {acc, agree}}} rows against the
    stored bounds; return (armed, violation strings)."""
    import json

    expected_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "quality_expected.json"
    )
    with open(expected_path) as f:
        expected = json.load(f)

    mode = os.environ.get("QC_GATE", "auto")
    if mode == "0":
        print("quality gate: disabled (QC_GATE=0)")
        return False, []
    on_signature = harness_signature() == expected["signature"]
    if not on_signature and mode != "1":
        print(
            "quality gate: skipped — signature mismatch\n"
            f"  run:      {harness_signature()}\n"
            f"  expected: {expected['signature']}\n"
            "  (bounds are calibrated for the flagship signature; "
            "QC_GATE=1 forces)"
        )
        return False, []

    violations = []
    for family, rows in expected.items():
        if family.startswith("_") or family == "signature":
            continue
        got_rows = metrics.get(family, {})
        f32_acc = got_rows.get("xla-f32", {}).get("acc")
        for label, bounds in rows.items():
            got = got_rows.get(label)
            if got is None:
                violations.append(f"{family}/{label}: row missing from run")
                continue
            if "acc_min" in bounds and got["acc"] < bounds["acc_min"]:
                violations.append(
                    f"{family}/{label}: accuracy {got['acc']:.4f} < "
                    f"floor {bounds['acc_min']}"
                )
            if "acc_delta_max" in bounds and f32_acc is not None:
                delta = abs(got["acc"] - f32_acc)
                if delta > bounds["acc_delta_max"]:
                    violations.append(
                        f"{family}/{label}: |acc - f32| = {delta:.4f} > "
                        f"{bounds['acc_delta_max']} "
                        f"({got['acc']:.4f} vs {f32_acc:.4f})"
                    )
            if "agree_min" in bounds and got.get("agree") is not None:
                if got["agree"] < bounds["agree_min"]:
                    violations.append(
                        f"{family}/{label}: token agreement "
                        f"{got['agree']:.4f} < floor {bounds['agree_min']}"
                    )
    return True, violations


def main():
    import jax

    print("platform:", jax.devices()[0].platform)
    ds = build_dataset()
    ckpt_dir = os.path.join(WORKDIR, "ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    vae, model = build_models(ds, ckpt_dir)
    train_if_needed(ds, vae, model)
    # trainers leave params sharded over THEIR mesh (which may have been
    # shrunk to fit the batch); normalize to host arrays so the eval jits
    # place everything consistently
    vae.params = jax.device_get(vae.params)
    model.params = jax.device_get(model.params)

    # held-out eval batch, fixed reference listening-test split (6/4/6)
    from inpaintnet_tpu.train.latent_rnn_trainer import pack_padded, split_score

    _, _, test_loader = ds.data_loaders(batch_size=EVAL_BATCH, split=(0.7, 0.2))
    batch = next(iter(test_loader))
    score = np.asarray(batch[0])
    past, future, target = split_score(score, 6, 6, 4, model.measure_seq_len)
    packed = pack_padded(past, future, target, ds.n_bars, model.max_target)
    p, pm, f, fm, t, tm = packed
    batch_args = (p, pm, f, fm, t, tm)
    tgt_mask = tm[:, :, None] * np.ones((1, 1, model.measure_seq_len))

    # each config pins the kernel-route variables it depends on, so
    # ambient env (a user-exported INPAINTNET_SERVE_QUANT, say) can't
    # mislabel a row. (INPAINTNET_GRU_IMPL is read once at import and
    # can't be pinned here — its two impls are exact-parity anyway.)
    configs = [
        ("xla-f32", "float32",
         {"INPAINTNET_ENCODER_IMPL": "xla", "INPAINTNET_DECODE_IMPL": "xla",
          "INPAINTNET_SERVE_QUANT": "none"}),
        ("pallas-bf16", "bfloat16",
         {"INPAINTNET_ENCODER_IMPL": "pallas",
          "INPAINTNET_DECODE_IMPL": "pallas",
          "INPAINTNET_SERVE_QUANT": "none"}),
        ("pallas-int8", "bfloat16",
         {"INPAINTNET_ENCODER_IMPL": "pallas",
          "INPAINTNET_DECODE_IMPL": "pallas",
          "INPAINTNET_SERVE_QUANT": "int8"}),
    ]
    results = {}
    metrics = {"latent": {}}
    for label, dtype, env in configs:
        samples = eval_config(model, vae, batch_args, dtype, env, label)
        results[label] = samples
        acc = ((samples == t) * tgt_mask).sum() / tgt_mask.sum()
        line = f"{label:>12}: inpaint accuracy {acc:.4f}"
        row = {"acc": float(acc), "agree": None}
        if label != "xla-f32":
            agree = ((samples == results["xla-f32"]) * tgt_mask).sum() / tgt_mask.sum()
            line += f"  token agreement vs f32 {agree:.4f}"
            row["agree"] = float(agree)
        metrics["latent"][label] = row
        print(line)

    # --- AnticipationRNN family (baseline models) ----------------------- #
    from inpaintnet_tpu.models import (
        AnticipationRNNBaseline,
        ConstraintModelGaussianReg,
    )
    from inpaintnet_tpu.train import (
        AnticipationRNNBaselineTrainer,
        AnticipationRNNGaussianRegTrainer,
    )

    b = score.shape[0]
    score_flat = score.reshape(b, -1).astype(np.int32)
    md_flat = np.asarray(batch[1]).reshape(b, score_flat.shape[1], -1).astype(
        np.int32
    )
    msl = model.measure_seq_len
    # 4-measure span at measures 7..11 — 7 past / 4 target / 5 future,
    # following the reference's start_measure = num_past + 1 quirk
    # (anticipation_rnn_trainer.py:93-128). NOTE: this is a slightly
    # different task than the LatentRNN rows' 6/4/6 split, so "span
    # accuracy" is not directly comparable to "inpaint accuracy" across
    # families — each family's rows compare serving configs of the SAME
    # task.
    loc = np.ones_like(score_flat)
    span = slice(7 * msl, 11 * msl)
    loc[:, span] = 0
    for cls, tr_cls, name in [
        (ConstraintModelGaussianReg, AnticipationRNNGaussianRegTrainer,
         "arnn-reg"),
        (AnticipationRNNBaseline, AnticipationRNNBaselineTrainer,
         "arnn-baseline"),
    ]:
        arnn = build_arnn(ds, ckpt_dir, cls)
        train_arnn_if_needed(ds, arnn, tr_cls)
        arnn.params = jax.device_get(arnn.params)
        ref = None
        metrics[name] = {}
        for label, dtype, env in [
            ("xla-f32", "float32", {"INPAINTNET_ARNN_IMPL": "xla"}),
            ("pallas-bf16", "bfloat16", {"INPAINTNET_ARNN_IMPL": "pallas"}),
        ]:
            gen = eval_arnn_config(arnn, score_flat, md_flat, loc, dtype, env)
            acc = (gen[:, span] == score_flat[:, span]).mean()
            line = f"{name + ' ' + label:>25}: span accuracy {acc:.4f}"
            row = {"acc": float(acc), "agree": None}
            if ref is None:
                ref = gen
            else:
                agree = (gen[:, span] == ref[:, span]).mean()
                line += f"  token agreement vs f32 {agree:.4f}"
                row["agree"] = float(agree)
            metrics[name][label] = row
            print(line)

    armed, violations = run_gate(metrics)
    if violations:
        print("QUALITY GATE FAILED:")
        for v in violations:
            print("  -", v)
        sys.exit(1)
    if armed:
        print("quality gate: PASS (all rows within expected bounds)")


if __name__ == "__main__":
    main()
