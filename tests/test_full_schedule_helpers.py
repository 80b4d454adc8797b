"""Unit tests for benchmarks/full_schedule.py's round-5 convergence
machinery: the corpus manifest gate (ADVICE round 4 — reusing a corpus
dir across a style/size change must hard-error, never silently train on
the wrong corpus), the merged validation-loss history, and the
early-stop replay that makes the reference's patience-5 criterion
(utils/trainer.py:379-413 semantics) survive run interruption."""
import importlib
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))


def _load(monkeypatch, tmp_path, **env):
    monkeypatch.setenv("FULLRUN_DIR", str(tmp_path / "work"))
    monkeypatch.setenv("FULLRUN_CORPUS", str(tmp_path / "corpus"))
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    import full_schedule

    return importlib.reload(full_schedule)


def test_corpus_manifest_written_and_checked(monkeypatch, tmp_path):
    fs = _load(monkeypatch, tmp_path, FULLRUN_TUNES="3",
               FULLRUN_STYLE="uniform")
    fs.ensure_corpus()
    mpath = os.path.join(fs.CORPUS, "corpus_manifest.json")
    with open(mpath) as f:
        assert json.load(f) == {"style": "uniform", "num_tunes": 3,
                                "num_bars": 16, "seed": 11}
    fs.ensure_corpus()  # matching manifest: reuse OK

    # same dir, different style -> hard error, not silent reuse
    fs2 = _load(monkeypatch, tmp_path, FULLRUN_TUNES="3",
                FULLRUN_STYLE="structured")
    with pytest.raises(SystemExit, match="manifest mismatch"):
        fs2.ensure_corpus()


def test_corpus_probe_stamps_legacy_dir(monkeypatch, tmp_path):
    """A pre-manifest corpus dir (round <=4 layout) is validated by
    regenerating tune_0 (shared-rng prefix property) and stamped."""
    from inpaintnet_tpu.data.synthetic import generate_corpus

    fs = _load(monkeypatch, tmp_path, FULLRUN_TUNES="3",
               FULLRUN_STYLE="uniform")
    generate_corpus(fs.CORPUS, num_tunes=3, num_bars=16, seed=11,
                    style="uniform")
    fs.ensure_corpus()
    assert os.path.exists(os.path.join(fs.CORPUS, "corpus_manifest.json"))

    # legacy dir whose content does NOT match the requested style
    fs2 = _load(monkeypatch, tmp_path, FULLRUN_TUNES="3",
                FULLRUN_STYLE="structured",
                FULLRUN_CORPUS=str(tmp_path / "corpus2"))
    generate_corpus(fs2.CORPUS, num_tunes=3, num_bars=16, seed=11,
                    style="uniform")
    with pytest.raises(SystemExit, match="unidentified"):
        fs2.ensure_corpus()


def test_val_history_merges_legacy_and_stable_logs(monkeypatch, tmp_path):
    fs = _load(monkeypatch, tmp_path)
    runs = os.path.join(fs.WORKDIR, "runs")
    os.makedirs(runs)
    # legacy timestamped log (epochs 0-1) + stable per-label log (2-3)
    with open(os.path.join(runs, "LatentRNN_1787000000.jsonl"), "w") as f:
        for e, v in ((0, 0.9), (1, 0.8)):
            f.write(json.dumps({"epoch_index": e, "mean_loss_val": v}) + "\n")
    with open(os.path.join(runs, "LatentRNN.jsonl"), "w") as f:
        for e, v in ((2, 0.7), (3, 0.65)):
            f.write(json.dumps({"epoch_index": e, "mean_loss_val": v}) + "\n")
    # an ablation log must NOT leak into the LatentRNN prefix glob
    with open(os.path.join(runs, "LatentRNNAblations_1787000001.jsonl"),
              "w") as f:
        f.write(json.dumps({"epoch_index": 0, "mean_loss_val": 9.9}) + "\n")
    assert fs._val_history("LatentRNN") == [0.9, 0.8, 0.7, 0.65]
    assert fs._val_history("Ablation-past") == []


def test_train_resumable_replays_early_stop(monkeypatch, tmp_path):
    """A resumed run whose completed history already exhausts patience
    must NOT train further; one with remaining patience must continue
    with the replayed counter state."""
    from inpaintnet_tpu.train.trainer import EarlyStopping

    fs = _load(monkeypatch, tmp_path)
    runs = os.path.join(fs.WORKDIR, "runs")
    os.makedirs(runs)
    # 1 improvement + 5 flat epochs -> patience 5 exhausted
    hist = [0.9, 0.8, 0.81, 0.82, 0.81, 0.82, 0.83]
    with open(os.path.join(runs, "Stalled.jsonl"), "w") as f:
        for e, v in enumerate(hist):
            f.write(json.dumps({"epoch_index": e, "mean_loss_val": v}) + "\n")

    class FakeTrainer:
        early_stopping = True

        def __init__(self, done):
            self.done = done
            self.early_stopper = EarlyStopping()
            self.calls = []

        def load_state(self):
            return self.done

        def train_model(self, **kw):
            self.calls.append(kw)

    t = FakeTrainer(done=len(hist))
    fs._train_resumable(t, 32, 40, "Stalled")
    assert t.calls == []  # replay says: already early-stopped

    t2 = FakeTrainer(done=3)  # only [0.9, 0.8, 0.81] replayed
    fs._train_resumable(t2, 32, 40, "Stalled")
    assert t2.early_stopper.counter == 1 and not t2.early_stopper.early_stop
    assert len(t2.calls) == 1 and t2.calls[0]["num_epochs"] == 37
    assert t2.calls[0]["run_name"] == "Stalled"
