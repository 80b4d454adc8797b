"""Batch listening-test generator (reference script_gen_diff_models.py:17-356):
for test melodies with >= 16 measures, write the original plus LatentRNN,
ARNN-reg and ARNN-baseline inpaintings (past 6 / target 4 / future 6
measures) as MIDI files into ``saved_midi/``."""
import os

import click
import jax
import numpy as np

from inpaintnet_tpu.cli.common import dataset_options, standard_datasets
from inpaintnet_tpu.data.abc_writer import write_abc
from inpaintnet_tpu.data.midi import write_midi
from inpaintnet_tpu.eval import AnticipationRNNTester, LatentRNNTester
from inpaintnet_tpu.models import (
    AnticipationRNNBaseline,
    ConstraintModelGaussianReg,
    LatentRNN,
    MeasureVAE,
)
from inpaintnet_tpu.train import split_score

NUM_PAST, NUM_TARGET, NUM_FUTURE = 6, 4, 6  # reference :144-148


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
@click.option('--num_layers', default=2)
@click.option('--lstm_hidden_size', default=256)
@click.option('--dropout_lstm', default=0.2)
@click.option('--input_dropout', default=0.2)
@click.option('--linear_hidden_size', default=256)
@click.option('--batch_size', default=16)
@click.option('--num_target', default=2)
@click.option('--num_models', default=4)
@click.option('--num_melodies', default=32)
@click.option('--save_folder', default='saved_midi')
@dataset_options
def main(note_embedding_dim, metadata_embedding_dim, num_encoder_layers,
         encoder_hidden_size, encoder_dropout_prob, has_metadata,
         latent_space_dim, num_decoder_layers, decoder_hidden_size,
         decoder_dropout_prob, num_latent_rnn_layers, latent_rnn_hidden_size,
         latent_rnn_dropout_prob, num_layers, lstm_hidden_size, dropout_lstm,
         input_dropout, linear_hidden_size, batch_size, num_target,
         num_models, num_melodies, save_folder,
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

    # --- originals (reference :151-168) --------------------------------- #
    test_filenames = folk_dataset_test.dataset_filenames
    usable = []
    for f in test_filenames[:num_melodies]:
        path = os.path.join(folk_dataset_test.corpus_it_gen.raw_dir, f)
        score = folk_dataset_test.corpus_it_gen.get_score_from_path(
            path, fix_and_expand=True
        )
        st = folk_dataset_test.get_score_tensor(score)
        if st.shape[1] < req_length:
            continue
        st = st[:, :req_length]
        usable.append((f[:-4], st))
        original = folk_dataset_test.tensor_to_score(st)
        write_midi(original, os.path.join(save_folder, f"{f[:-4]}_original.mid"))
        with open(os.path.join(save_folder, f"{f[:-4]}_original.abc"), "w") as fh:
            fh.write(write_abc(original, title=f"{f[:-4]} original"))

    # --- LatentRNN inpaintings (reference :171-233; shipped config
    #     auto_reg=False, :178) ------------------------------------------ #
    latent_rnn_model = LatentRNN(
        dataset=folk_dataset_train, vae_model=vae_model,
        num_rnn_layers=num_latent_rnn_layers,
        rnn_hidden_size=latent_rnn_hidden_size,
        dropout=latent_rnn_dropout_prob, auto_reg=False, teacher_forcing=True,
    )
    latent_rnn_model.init(jax.random.PRNGKey(1))
    latent_rnn_model.load()
    latent_rnn_tester = LatentRNNTester(folk_dataset_test, latent_rnn_model)
    for f_id, st in usable:
        past, future, target = split_score(
            st[:, None, :], NUM_PAST, NUM_FUTURE, NUM_TARGET, 24
        )
        gen_score, _, _ = latent_rnn_tester.generate(
            past, future, target, NUM_TARGET
        )
        write_midi(gen_score, os.path.join(save_folder, f"{f_id}_latent_rnn.mid"))
        with open(os.path.join(save_folder, f"{f_id}_latent_rnn.abc"), "w") as fh:
            fh.write(write_abc(gen_score, title=f"{f_id} latent_rnn"))

    # --- ARNN reg + baseline inpaintings (reference :236-352) ------------- #
    def arnn_pass(model_cls, trained_name, suffix):
        model = model_cls(
            dataset=folk_dataset_train,
            note_embedding_dim=note_embedding_dim,
            metadata_embedding_dim=metadata_embedding_dim,
            num_layers=num_layers,
            num_lstm_constraints_units=lstm_hidden_size,
            num_lstm_generation_units=lstm_hidden_size,
            linear_hidden_size=linear_hidden_size,
            dropout_prob=dropout_lstm,
            dropout_input_prob=input_dropout,
            unary_constraint=True,
        )
        model.init(jax.random.PRNGKey(2))
        model.load()
        tester = AnticipationRNNTester(folk_dataset_test, model)
        for f_id, st in usable:
            path = os.path.join(folk_dataset_test.corpus_it_gen.raw_dir, f_id + ".abc")
            score = folk_dataset_test.corpus_it_gen.get_score_from_path(
                path, fix_and_expand=True
            )
            md = folk_dataset_test.get_metadata_tensor(score)[:req_length]
            gen_score, _, _ = tester.generation(
                tensor_score=st, tensor_metadata=md,
                start_measure=NUM_PAST, num_measures_gen=NUM_TARGET,
                temperature=1.5,
            )
            write_midi(gen_score, os.path.join(save_folder, f"{f_id}_{suffix}.mid"))

    arnn_pass(ConstraintModelGaussianReg, "reg", "arnn_reg")
    arnn_pass(AnticipationRNNBaseline, "baseline", "arnn_baseline")
    print(f"wrote {4 * len(usable)} MIDI files to {save_folder}/")


if __name__ == '__main__':
    main()
