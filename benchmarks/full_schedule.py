"""Full reference training schedule at corpus scale (round-2 verdict #8).

Runs the PRODUCT training pipeline end-to-end. Every schedule knob is an
env-configurable default (FULLRUN_TUNES corpus size — 13,684 matches the
real Session valid-file list, 481k transposition-augmented 16-bar windows
at the uniform style; FULLRUN_{VAE,LATENT,ARNN,ABLATION}_EPOCHS;
FULLRUN_STYLE; FULLRUN_EARLY_STOP):

1. MeasureVAE — the reference's 30-epoch / batch-256 schedule
   (train_measure_vae.py:33-44 defaults), bf16 compute
2. LatentRNN — batch 32 (reference default); with FULLRUN_EARLY_STOP=1
   trains until the valid loss plateaus (patience-5 EarlyStopping, the
   reference's criterion, utils/trainer.py:379-413), capped at
   FULLRUN_LATENT_EPOCHS
3. ARNN reg + baseline — same early-stop option, FULLRUN_ARNN_EPOCHS cap
4. LatentRNNAblations (FULLRUN_ABLATIONS, e.g. "past" — reference
   train_inpaintnet_ablation.py:148) — same early-stop option
5. ``test_reconstruction.py`` — the joint eval harness (+ ablation rows)
6. ``eval/report.py`` HTML report -> docs/artifacts/full_schedule*.html

Resume-aware: every trainer checkpoints per epoch into WORKDIR, each
model logs to ONE stable runs/<label>.jsonl, and on resume the completed
epochs' valid losses are replayed into the early stopper so the patience
criterion survives interruption. Usage:

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
# point FULLRUN_DIR/FULLRUN_CORPUS at a style-specific location (the
# corpus manifest below catches a mismatched reuse either way).
STYLE = os.environ.get("FULLRUN_STYLE", "uniform")
# corpus size in tunes; the default matches the real Session valid-file
# list. Structured model-ordering runs use a smaller corpus with more
# epochs (docs/PERFORMANCE.md).
NUM_TUNES = int(os.environ.get("FULLRUN_TUNES", "13684"))
CORPUS_SEED = 11
# FULLRUN_EARLY_STOP=1: LatentRNN/ARNN/ablation phases train with the
# reference's patience-5 valid-loss EarlyStopping until plateau; the
# FULLRUN_*_EPOCHS values become caps instead of exact counts.
EARLY_STOP = os.environ.get("FULLRUN_EARLY_STOP", "0") == "1"
# comma list of LatentRNNAblations context types to train + evaluate
# ("past", "future"); empty = skip the ablation phase
ABLATIONS = [s for s in os.environ.get("FULLRUN_ABLATIONS", "").split(",")
             if s]
NUM_ABLATION_EPOCHS = int(
    os.environ.get("FULLRUN_ABLATION_EPOCHS", str(NUM_LATENT_EPOCHS))
)

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


MANIFEST = {"style": STYLE, "num_tunes": NUM_TUNES, "num_bars": 16,
            "seed": CORPUS_SEED}


def _probe_matches():
    """Byte-compare CORPUS/tune_0.abc against a fresh generation. The
    corpus generator threads ONE rng through the tunes (synthetic.py
    generate_corpus), so same (style, seed) corpora share a prefix:
    tune_0 equality + the file count pins (style, seed, num_tunes)."""
    import tempfile

    from inpaintnet_tpu.data.synthetic import generate_corpus

    with tempfile.TemporaryDirectory() as td:
        generate_corpus(td, num_tunes=1, num_bars=16, seed=CORPUS_SEED,
                        style=STYLE)
        with open(os.path.join(td, "tune_0.abc")) as f:
            want = f.read()
    try:
        with open(os.path.join(CORPUS, "tune_0.abc")) as f:
            return f.read() == want
    except OSError:
        return False


def ensure_corpus():
    """Reuse CORPUS only when it verifiably holds THIS run's corpus: a
    manifest (style, num_tunes, seed) is written on generation and
    compared on reuse; a pre-manifest directory is validated by content
    probe and stamped, or rejected — silently training on a stale
    corpus after a style/size change is an error, never a fallback."""
    import json

    mpath = os.path.join(CORPUS, "corpus_manifest.json")
    n_tunes = (len([f for f in os.listdir(CORPUS) if f.endswith(".abc")])
               if os.path.isdir(CORPUS) else 0)
    if n_tunes >= NUM_TUNES:
        if os.path.exists(mpath):
            with open(mpath) as f:
                got = json.load(f)
            if got != MANIFEST:
                raise SystemExit(
                    f"corpus manifest mismatch at {CORPUS}: have {got}, "
                    f"want {MANIFEST} — delete the directory or point "
                    f"FULLRUN_CORPUS at a fresh location"
                )
        elif _probe_matches() and n_tunes == NUM_TUNES:
            with open(mpath, "w") as f:
                json.dump(MANIFEST, f)
            print(f"corpus validated by probe, manifest stamped: {CORPUS}")
        else:
            raise SystemExit(
                f"unidentified pre-existing corpus at {CORPUS} "
                f"({n_tunes} tunes, no manifest, probe mismatch for "
                f"{MANIFEST}) — delete it or point FULLRUN_CORPUS elsewhere"
            )
        print(f"corpus present: {CORPUS}")
        return
    from inpaintnet_tpu.data.synthetic import generate_corpus

    print(f"generating {NUM_TUNES}-tune corpus at {CORPUS} (style={STYLE})")
    generate_corpus(CORPUS, num_tunes=NUM_TUNES, num_bars=16,
                    seed=CORPUS_SEED, style=STYLE)
    with open(mpath, "w") as f:
        json.dump(MANIFEST, f)


def _datasets():
    os.chdir(WORKDIR)  # checkpoints are cwd-relative (models/base.py)
    from inpaintnet_tpu.cli.common import standard_datasets

    return standard_datasets(
        "folk_4by4nbars_train",
        cache_dir=os.path.join(WORKDIR, "cache"),
        corpus_dir=CORPUS,
    )


# pre-round-5 runs logged to timestamped per-call files
# (<ClassName>_<ts>.jsonl); map labels to those prefixes so resumed
# early-stop replay sees the full validation history
_LEGACY_LOG_PREFIX = {
    "MeasureVAE": "MeasureVAE_",
    "LatentRNN": "LatentRNN_",
    "ARNN-reg": "ConstraintModelGaussianReg_",
    "ARNN-baseline": "AnticipationRNNBaseline_",
}


def _val_history(label, workdir=None):
    """Valid-loss per completed epoch, merged across this label's stable
    log and any legacy timestamped logs, ordered by absolute epoch index
    (train_model numbers epochs absolutely, so resumes never collide)."""
    import glob
    import json

    runs = os.path.join(workdir or WORKDIR, "runs")
    files = glob.glob(os.path.join(runs, label + ".jsonl"))
    pre = _LEGACY_LOG_PREFIX.get(label)
    if pre:
        files += glob.glob(os.path.join(runs, pre + "*.jsonl"))
    by_epoch = {}
    for path in sorted(files):
        with open(path) as f:
            for line in f:
                try:
                    d = json.loads(line)
                except ValueError:
                    continue
                by_epoch[d["epoch_index"]] = d["mean_loss_val"]
    return [by_epoch[i] for i in sorted(by_epoch)]


def _train_resumable(trainer, batch_size, num_epochs, label):
    """Per-epoch-resumable training: the CLI scripts train fresh, but a
    multi-hour schedule needs to survive interruption — ``load_state``
    restores params+opt+epoch, and ``train_model`` counts absolutely.
    With early stopping, completed epochs' valid losses are replayed
    into the stopper so patience survives interruption too."""
    import time as _t

    try:
        done = trainer.load_state()
        print(f"{label}: resuming after {done} completed epochs", flush=True)
    except Exception:  # noqa: BLE001 — fresh run
        done = 0
    if trainer.early_stopping and done:
        for v in _val_history(label)[:done]:
            trainer.early_stopper(v)
        if trainer.early_stopper.early_stop:
            print(f"{label}: early-stop criterion already met after "
                  f"{done} epochs (replayed)", flush=True)
            return
    remaining = num_epochs - done
    if remaining <= 0:
        print(f"{label}: already trained {done} epochs", flush=True)
        return
    t0 = _t.time()
    trainer.train_model(batch_size=batch_size, num_epochs=remaining,
                        log=True, run_name=label)
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
                               compute_dtype="bfloat16",
                               early_stopping=EARLY_STOP)
    _train_resumable(trainer, 32, NUM_LATENT_EPOCHS, "LatentRNN")
    loss, acc = LatentRNNTester(test_ds, model).test_model(batch_size=256)
    print(f"LatentRNN test NLL {loss:.4f} acc {acc:.4f}", flush=True)


def phase_ablation():
    """LatentRNNAblations — single-context conditioning (reference
    train_inpaintnet_ablation.py:148), same schedule/criterion as the
    LatentRNN phase so the joint eval compares apples to apples."""
    from inpaintnet_tpu.eval.latent_rnn_tester import LatentRNNTester
    from inpaintnet_tpu.models.latent_rnn import LatentRNNAblations
    from inpaintnet_tpu.models.measure_vae import MeasureVAE
    from inpaintnet_tpu.train import LatentRNNTrainer

    import jax

    train_ds, test_ds = _datasets()
    vae = MeasureVAE(train_ds)
    vae.init(jax.random.PRNGKey(0))
    vae.load()
    for ctx_type in ABLATIONS or ["past"]:
        model = LatentRNNAblations(
            train_ds, vae, num_rnn_layers=2, rnn_hidden_size=512,
            dropout=0.5, auto_reg=False, type=ctx_type,
        )
        trainer = LatentRNNTrainer(train_ds, model, lr=1e-4,
                                   compute_dtype="bfloat16",
                                   early_stopping=EARLY_STOP)
        _train_resumable(trainer, 32, NUM_ABLATION_EPOCHS,
                         f"Ablation-{ctx_type}")
        loss, acc = LatentRNNTester(test_ds, model).test_model(
            batch_size=256
        )
        print(f"Ablation-{ctx_type} test NLL {loss:.4f} acc {acc:.4f}",
              flush=True)


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
        trainer = tr_cls(train_ds, model, lr=1e-4, compute_dtype="bfloat16",
                         early_stopping=EARLY_STOP)
        _train_resumable(trainer, 32, NUM_ARNN_EPOCHS, label)
        loss, acc = AnticipationRNNTester(test_ds, model).test_model(
            batch_size=256
        )
        print(f"{label} test NLL {loss:.4f} acc {acc:.4f}", flush=True)


def phase_eval():
    args = ["--batch_size", 256]
    if ABLATIONS:
        args += ["--include_ablations", ",".join(ABLATIONS)]
    run("test_reconstruction.py", *args)


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
    "ablation": phase_ablation,
    "eval": phase_eval,
    "report": phase_report,
}


def main():
    os.makedirs(WORKDIR, exist_ok=True)
    ensure_corpus()
    default = ["vae", "latent", "arnn"]
    if ABLATIONS:
        default.append("ablation")
    default += ["eval", "report"]
    wanted = sys.argv[1:] or default
    for name in wanted:
        PHASES[name]()


if __name__ == "__main__":
    main()
