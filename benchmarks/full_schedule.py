"""Full reference training schedule at corpus scale (round-2 verdict #8).

Runs the PRODUCT CLI scripts end-to-end on the 13,684-tune corpus
(the size of the real Session valid-file list; 481k transposition-
augmented 16-bar windows):

1. ``train_measure_vae.py`` — the reference's 30-epoch / batch-256
   schedule (train_measure_vae.py:33-44 defaults), bf16 compute
2. ``train_inpaintnet.py`` — LatentRNN, batch 32 (reference default),
   NUM_LATENT_EPOCHS epochs (quality saturates by 2 at this scale —
   docs/PERFORMANCE.md; the reference's 100 epochs over its unstated
   corpus size is matched in gradient-steps-per-window terms)
3. ``train_arnn_reg.py`` + ``train_arnn_baseline.py`` — 1 epoch each
4. ``test_reconstruction.py`` — the joint eval harness
5. ``eval/report.py`` HTML report -> docs/artifacts/full_schedule.html

Resume-aware: every trainer checkpoints per epoch into WORKDIR, so
re-running continues. Usage:

    python benchmarks/full_schedule.py [phase...]   # default: all
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKDIR = os.environ.get("FULLRUN_DIR", "/tmp/fullrun")
CORPUS = os.environ.get("FULLRUN_CORPUS", "/tmp/scale_test/corpus")
NUM_VAE_EPOCHS = int(os.environ.get("FULLRUN_VAE_EPOCHS", "30"))
NUM_LATENT_EPOCHS = int(os.environ.get("FULLRUN_LATENT_EPOCHS", "2"))
NUM_ARNN_EPOCHS = int(os.environ.get("FULLRUN_ARNN_EPOCHS", "1"))
# "uniform" or "structured" (phrase-form corpus; data/synthetic.py) —
# point FULLRUN_DIR/FULLRUN_CORPUS at a style-specific location.
STYLE = os.environ.get("FULLRUN_STYLE", "uniform")
# corpus size in tunes; the default matches the real Session valid-file
# list. Structured model-ordering runs use a smaller corpus with more
# epochs (docs/PERFORMANCE.md).
NUM_TUNES = int(os.environ.get("FULLRUN_TUNES", "13684"))

DATASET_FLAGS = [
    "--dataset_name", "folk_4by4nbars_train",
    "--corpus_dir", CORPUS,
    "--cache_dir", os.path.join(WORKDIR, "cache"),
]


def run(script, *args):
    cmd = [sys.executable, os.path.join(REPO, script), *DATASET_FLAGS,
           *[str(a) for a in args]]
    print(f"\n=== {' '.join(cmd)}", flush=True)
    t0 = time.time()
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    subprocess.run(cmd, cwd=WORKDIR, check=True, env=env)
    print(f"=== done in {time.time() - t0:.0f}s", flush=True)


def ensure_corpus():
    if os.path.isdir(CORPUS) and len(os.listdir(CORPUS)) >= NUM_TUNES:
        print(f"corpus present: {CORPUS}")
        return
    from inpaintnet_tpu.data.synthetic import generate_corpus

    print(f"generating {NUM_TUNES}-tune corpus at {CORPUS} (style={STYLE})")
    generate_corpus(CORPUS, num_tunes=NUM_TUNES, num_bars=16, seed=11,
                    style=STYLE)


def _datasets():
    os.chdir(WORKDIR)  # checkpoints are cwd-relative (models/base.py)
    from inpaintnet_tpu.cli.common import standard_datasets

    return standard_datasets(
        "folk_4by4nbars_train",
        cache_dir=os.path.join(WORKDIR, "cache"),
        corpus_dir=CORPUS,
    )


def _train_resumable(trainer, batch_size, num_epochs, label):
    """Per-epoch-resumable training: the CLI scripts train fresh, but a
    multi-hour schedule needs to survive interruption — ``load_state``
    restores params+opt+epoch, and ``train_model`` counts absolutely."""
    import time as _t

    try:
        done = trainer.load_state()
        print(f"{label}: resuming after {done} completed epochs", flush=True)
    except Exception:  # noqa: BLE001 — fresh run
        done = 0
    remaining = num_epochs - done
    if remaining <= 0:
        print(f"{label}: already trained {done} epochs", flush=True)
        return
    t0 = _t.time()
    trainer.train_model(batch_size=batch_size, num_epochs=remaining, log=True)
    print(f"{label}: {remaining} epochs in {_t.time() - t0:.0f}s", flush=True)


def phase_vae():
    from inpaintnet_tpu.eval.vae_tester import VAETester
    from inpaintnet_tpu.models.measure_vae import MeasureVAE
    from inpaintnet_tpu.train import VAETrainer

    train_ds, test_ds = _datasets()
    vae = MeasureVAE(train_ds)
    trainer = VAETrainer(train_ds, vae, lr=1e-4, compute_dtype="bfloat16")
    _train_resumable(trainer, 256, NUM_VAE_EPOCHS, "MeasureVAE")
    loss, acc = VAETester(test_ds, vae).test_model(batch_size=256)
    print(f"VAE test NLL {loss:.4f} acc {acc:.4f}", flush=True)


def phase_latent():
    from inpaintnet_tpu.eval.latent_rnn_tester import LatentRNNTester
    from inpaintnet_tpu.models.latent_rnn import LatentRNN
    from inpaintnet_tpu.models.measure_vae import MeasureVAE
    from inpaintnet_tpu.train import LatentRNNTrainer

    import jax

    train_ds, test_ds = _datasets()
    vae = MeasureVAE(train_ds)
    vae.init(jax.random.PRNGKey(0))
    vae.load()
    model = LatentRNN(train_ds, vae, num_rnn_layers=2, rnn_hidden_size=512,
                      dropout=0.5, auto_reg=False)
    trainer = LatentRNNTrainer(train_ds, model, lr=1e-4,
                               compute_dtype="bfloat16")
    _train_resumable(trainer, 32, NUM_LATENT_EPOCHS, "LatentRNN")
    loss, acc = LatentRNNTester(test_ds, model).test_model(batch_size=256)
    print(f"LatentRNN test NLL {loss:.4f} acc {acc:.4f}", flush=True)


def phase_arnn():
    from inpaintnet_tpu.eval.anticipation_rnn_tester import (
        AnticipationRNNTester,
    )
    from inpaintnet_tpu.models.anticipation_rnn import (
        AnticipationRNNBaseline,
        ConstraintModelGaussianReg,
    )
    from inpaintnet_tpu.train import (
        AnticipationRNNBaselineTrainer,
        AnticipationRNNGaussianRegTrainer,
    )

    train_ds, test_ds = _datasets()
    for cls, tr_cls, label in (
        (ConstraintModelGaussianReg, AnticipationRNNGaussianRegTrainer,
         "ARNN-reg"),
        (AnticipationRNNBaseline, AnticipationRNNBaselineTrainer,
         "ARNN-baseline"),
    ):
        model = cls(
            train_ds, note_embedding_dim=10, metadata_embedding_dim=2,
            num_lstm_constraints_units=256, num_lstm_generation_units=256,
            linear_hidden_size=256, num_layers=2, dropout_input_prob=0.2,
            dropout_prob=0.2, unary_constraint=True,
        )
        trainer = tr_cls(train_ds, model, lr=1e-4, compute_dtype="bfloat16")
        _train_resumable(trainer, 32, NUM_ARNN_EPOCHS, label)
        loss, acc = AnticipationRNNTester(test_ds, model).test_model(
            batch_size=256
        )
        print(f"{label} test NLL {loss:.4f} acc {acc:.4f}", flush=True)


def phase_eval():
    run("test_reconstruction.py", "--batch_size", 256)


def phase_report():
    from inpaintnet_tpu.eval.latent_rnn_tester import LatentRNNTester
    from inpaintnet_tpu.eval.report import build_report
    from inpaintnet_tpu.eval.vae_tester import VAETester
    from inpaintnet_tpu.models.latent_rnn import LatentRNN
    from inpaintnet_tpu.models.measure_vae import MeasureVAE

    import jax

    train_ds, test_ds = _datasets()
    vae = MeasureVAE(train_ds)
    vae.init(jax.random.PRNGKey(0))
    vae.load()
    model = LatentRNN(train_ds, vae, num_rnn_layers=2, rnn_hidden_size=512,
                      dropout=0.5, auto_reg=False)
    model.init(jax.random.PRNGKey(1))
    model.load()
    name = os.environ.get(
        "FULLRUN_REPORT_NAME",
        "full_schedule.html" if STYLE == "uniform"
        else f"full_schedule_{STYLE}.html",
    )
    out = os.path.join(REPO, "docs", "artifacts", name)
    path = build_report(
        vae_tester=VAETester(test_ds, vae),
        latent_tester=LatentRNNTester(test_ds, model),
        out_path=out,
        batch_size=256,
    )
    print(f"report written: {path}")


PHASES = {
    "vae": phase_vae,
    "latent": phase_latent,
    "arnn": phase_arnn,
    "eval": phase_eval,
    "report": phase_report,
}


def main():
    os.makedirs(WORKDIR, exist_ok=True)
    ensure_corpus()
    wanted = sys.argv[1:] or ["vae", "latent", "arnn", "eval", "report"]
    for name in wanted:
        PHASES[name]()


if __name__ == "__main__":
    main()
