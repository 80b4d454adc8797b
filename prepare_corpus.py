"""Corpus preparation CLI.

The reference downloads The Session dump with wget inside the dataset
constructor (folk_data_helpers.py:204-228); this environment-independent
tool does the offline steps explicitly:

    # split a downloaded sessions_data_clean.txt dump into per-tune files
    python prepare_corpus.py split --dump sessions_data_clean.txt \\
        --out_dir dataset_cache/raw_data

    # or make a synthetic corpus for smoke runs
    python prepare_corpus.py synth --out_dir dataset_cache/raw_data \\
        --num_tunes 200

    # run the validity filter + print corpus statistics
    python prepare_corpus.py stats --corpus_dir dataset_cache/raw_data
"""
import click


@click.group()
def cli():
    pass


@cli.command()
@click.option("--dump", required=True, help="path to sessions_data_clean.txt")
@click.option("--out_dir", default="dataset_cache/raw_data")
def split(dump, out_dir):
    from inpaintnet_tpu.data.corpus import split_raw_dump

    n = split_raw_dump(dump, out_dir)
    click.echo(f"wrote {n} tunes to {out_dir}")


@cli.command()
@click.option("--out_dir", default="dataset_cache/raw_data")
@click.option("--num_tunes", default=200)
@click.option("--num_bars", default=16)
@click.option("--seed", default=0)
@click.option("--time_sig", default="4/4")
def synth(out_dir, num_tunes, num_bars, seed, time_sig):
    from inpaintnet_tpu.data.synthetic import generate_corpus

    num, den = (int(x) for x in time_sig.split("/"))
    names = generate_corpus(out_dir, num_tunes, num_bars, seed, (num, den))
    click.echo(f"wrote {len(names)} synthetic tunes to {out_dir}")


@cli.command()
@click.option("--corpus_dir", default="dataset_cache/raw_data")
@click.option("--cache_dir", default="dataset_cache")
@click.option("--time_sigs", default="4/4", help="comma-separated, e.g. 3/4,4/4")
def stats(corpus_dir, cache_dir, time_sigs):
    from inpaintnet_tpu.data.corpus import FolkCorpus

    sigs = []
    for ts in time_sigs.split(","):
        num, den = (int(x) for x in ts.split("/"))
        sigs.append((num, den))
    corpus = FolkCorpus(raw_dir=corpus_dir, time_sigs=sigs, cache_dir=cache_dir)
    click.echo(f"valid tunes: {len(corpus.valid_tune_filenames)}")
    s = corpus.scan_dataset()
    click.echo(f"files scanned: {s['num_files']}")
    click.echo(f"pitch range: [{s['min_pitch']}, {s['max_pitch']}]")
    click.echo(f"time signatures: {s['time_signatures']}")
    click.echo(f"duration histogram: {s['dur_dist']}")


if __name__ == "__main__":
    cli()
