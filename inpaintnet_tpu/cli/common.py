"""Shared CLI plumbing for the entry scripts."""
from __future__ import annotations

import os

if os.environ.get("INPAINTNET_FORCE_CPU"):
    # some hosted TPU plugins override JAX_PLATFORMS at import time; the
    # config API wins if applied before backend initialization
    import jax

    jax.config.update("jax_platforms", "cpu")

from inpaintnet_tpu.data import BeatMarkerMetadata, DatasetManager, TickMetadata


def standard_datasets(dataset_name: str = "folk_4by4nbars_train",
                      cache_dir=None, corpus_dir=None, num_bars: int = 16):
    """The train/test FolkDatasetNBars pair every entry script builds
    (e.g. reference train_measure_vae.py:63-88)."""
    manager = DatasetManager(cache_dir=cache_dir, corpus_dir=corpus_dir)
    metadatas = [BeatMarkerMetadata(subdivision=6), TickMetadata(subdivision=6)]
    kwargs = {"metadatas": metadatas, "sequences_size": 32, "num_bars": num_bars}
    train_ds = manager.get_dataset(dataset_name, train=True, **kwargs)
    test_ds = manager.get_dataset(dataset_name, train=False, **kwargs)
    return train_ds, test_ds


def dataset_options(f):
    """Extra (non-reference) options for pointing at corpus/cache dirs."""
    import click

    f = click.option("--dataset_name", default="folk_4by4nbars_train",
                     help="registry name of the dataset")(f)
    f = click.option("--corpus_dir", default=None,
                     help="directory of tune_*.abc files "
                          "(default $INPAINTNET_CORPUS_DIR)")(f)
    f = click.option("--cache_dir", default=None,
                     help="dataset cache directory")(f)
    return f
