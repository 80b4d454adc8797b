"""Diversity demo (reference script_gen_same_context.py:15-214): N stochastic
re-inpaintings of ONE fixed tune with the same past/future context."""
import os

import click
import jax
import numpy as np

from inpaintnet_tpu.cli.common import dataset_options, standard_datasets
from inpaintnet_tpu.data.abc_writer import write_abc
from inpaintnet_tpu.data.midi import write_midi
from inpaintnet_tpu.eval import LatentRNNTester
from inpaintnet_tpu.models import LatentRNN, MeasureVAE
from inpaintnet_tpu.train import split_score

NUM_PAST, NUM_TARGET, NUM_FUTURE = 6, 4, 6


@click.command()
@click.option('--note_embedding_dim', default=10)
@click.option('--metadata_embedding_dim', default=2)
@click.option('--num_encoder_layers', default=2)
@click.option('--encoder_hidden_size', default=512)
@click.option('--encoder_dropout_prob', default=0.5)
@click.option('--has_metadata', default=True)
@click.option('--latent_space_dim', default=256)
@click.option('--num_decoder_layers', default=2)
@click.option('--decoder_hidden_size', default=512)
@click.option('--decoder_dropout_prob', default=0.5)
@click.option('--num_latent_rnn_layers', default=2)
@click.option('--latent_rnn_hidden_size', default=512)
@click.option('--latent_rnn_dropout_prob', default=0.5)
@click.option('--tune_id', default='tune_16154',
              help='filename stem of the fixed tune (reference :185)')
@click.option('--num_generations', default=15)
@click.option('--save_folder', default='saved_midi')
@dataset_options
def main(note_embedding_dim, metadata_embedding_dim, num_encoder_layers,
         encoder_hidden_size, encoder_dropout_prob, has_metadata,
         latent_space_dim, num_decoder_layers, decoder_hidden_size,
         decoder_dropout_prob, num_latent_rnn_layers, latent_rnn_hidden_size,
         latent_rnn_dropout_prob, tune_id, num_generations, save_folder,
         dataset_name, corpus_dir, cache_dir):
    folk_dataset_train, folk_dataset_test = standard_datasets(
        dataset_name, cache_dir=cache_dir, corpus_dir=corpus_dir
    )
    os.makedirs(save_folder, exist_ok=True)
    req_length = 16 * 4 * 6

    vae_model = MeasureVAE(
        dataset=folk_dataset_train,
        note_embedding_dim=note_embedding_dim,
        metadata_embedding_dim=metadata_embedding_dim,
        num_encoder_layers=num_encoder_layers,
        encoder_hidden_size=encoder_hidden_size,
        encoder_dropout_prob=encoder_dropout_prob,
        latent_space_dim=latent_space_dim,
        num_decoder_layers=num_decoder_layers,
        decoder_hidden_size=decoder_hidden_size,
        decoder_dropout_prob=decoder_dropout_prob,
        has_metadata=has_metadata,
    )
    vae_model.init(jax.random.PRNGKey(0))
    vae_model.load()

    model = LatentRNN(
        dataset=folk_dataset_train, vae_model=vae_model,
        num_rnn_layers=num_latent_rnn_layers,
        rnn_hidden_size=latent_rnn_hidden_size,
        dropout=latent_rnn_dropout_prob, auto_reg=False, teacher_forcing=True,
    )
    model.init(jax.random.PRNGKey(1))
    model.load()

    fname = tune_id + ".abc"
    if fname not in folk_dataset_test.dataset_filenames:
        # fall back to the first usable test tune
        fname = folk_dataset_test.dataset_filenames[0]
        tune_id = fname[:-4]
    path = os.path.join(folk_dataset_test.corpus_it_gen.raw_dir, fname)
    score = folk_dataset_test.corpus_it_gen.get_score_from_path(
        path, fix_and_expand=True
    )
    st = folk_dataset_test.get_score_tensor(score)
    if st.shape[1] < req_length:
        raise SystemExit(f"{tune_id} is shorter than 16 measures")
    st = st[:, :req_length]
    past, future, target = split_score(
        st[:, None, :], NUM_PAST, NUM_FUTURE, NUM_TARGET, 24
    )
    # stochasticity comes from the VAE encoder's rsample per seed
    for j in range(num_generations):
        tester = LatentRNNTester(folk_dataset_test, model, seed=j)
        gen_score, _, _ = tester.generate(past, future, target, NUM_TARGET)
        write_midi(
            gen_score,
            os.path.join(save_folder, f"{tune_id}_{j}_latent_rnn.mid"),
        )
        with open(os.path.join(save_folder, f"{tune_id}_{j}_latent_rnn.abc"), "w") as fh:
            fh.write(write_abc(gen_score, title=f"{tune_id} regen {j}"))
    print(f"wrote {num_generations} re-inpaintings of {tune_id} to {save_folder}/")


if __name__ == '__main__':
    main()
