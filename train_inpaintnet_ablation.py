"""Train / evaluate the LatentRNN past-only ablation
(reference train_inpaintnet_ablation.py:15-193, same flag set;
``type='past'`` like reference :148)."""
import click
import jax

from inpaintnet_tpu.cli.common import dataset_options, standard_datasets
from inpaintnet_tpu.eval import LatentRNNTester
from inpaintnet_tpu.models import LatentRNNAblations, MeasureVAE
from inpaintnet_tpu.train import LatentRNNTrainer


@click.command()
@click.option('--note_embedding_dim', default=10, help='size of the note embeddings')
@click.option('--metadata_embedding_dim', default=2, help='size of the metadata embeddings')
@click.option('--num_encoder_layers', default=2, help='number of layers in encoder RNN')
@click.option('--encoder_hidden_size', default=512, help='hidden size of the encoder RNN')
@click.option('--encoder_dropout_prob', default=0.5, help='dropout prob between encoder RNN layers')
@click.option('--has_metadata', default=True, help='bool, True if data contains metadata')
@click.option('--latent_space_dim', default=256, help='dimension of latent space')
@click.option('--num_decoder_layers', default=2, help='number of layers in decoder RNN')
@click.option('--decoder_hidden_size', default=512, help='hidden size of the decoder RNN')
@click.option('--decoder_dropout_prob', default=0.5, help='dropout prob between decoder RNN layers')
@click.option('--num_latent_rnn_layers', default=2, help='number of layers in measure RNN')
@click.option('--latent_rnn_hidden_size', default=512, help='hidden size of the measure RNN')
@click.option('--latent_rnn_dropout_prob', default=0.5, help='dropout prob between measure RNN layers')
@click.option('--batch_size', default=32, help='training batch size')
@click.option('--num_epochs', default=50, help='number of training epochs')
@click.option('--train/--test', default=True, help='train or evaluate the model')
@click.option('--lr', default=1e-4, help='learning rate')
@click.option('--plot/--no_plot', default=True, help='plot the training log')
@click.option('--log/--no_log', default=True, help='log epoch metrics')
@click.option('--auto_reg/--no_auto_reg', default=True, help='auto-regressive generation RNN')
@click.option('--teacher_forcing/--no_teacher_forcing', default=True, help='use teacher forcing')
@click.option('--early_stop/--no_early_stop', default=True, help='use early stopping')
@click.option('--context_type', default='past', type=click.Choice(['past', 'future']),
              help='which single context conditions generation')
@click.option('--compute_dtype', default=None,
              type=click.Choice(['bfloat16', 'float32']),
              help='mixed-precision compute dtype (fp32 master params)')
@dataset_options
def main(note_embedding_dim, metadata_embedding_dim, num_encoder_layers,
         encoder_hidden_size, encoder_dropout_prob, has_metadata,
         latent_space_dim, num_decoder_layers, decoder_hidden_size,
         decoder_dropout_prob, num_latent_rnn_layers, latent_rnn_hidden_size,
         latent_rnn_dropout_prob, batch_size, num_epochs, train, lr, plot,
         log, auto_reg, teacher_forcing, early_stop, context_type,
         compute_dtype, dataset_name, corpus_dir, cache_dir):
    folk_dataset_train, folk_dataset_test = standard_datasets(
        dataset_name, cache_dir=cache_dir, corpus_dir=corpus_dir
    )
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

    model = LatentRNNAblations(
        dataset=folk_dataset_train,
        vae_model=vae_model,
        num_rnn_layers=num_latent_rnn_layers,
        rnn_hidden_size=latent_rnn_hidden_size,
        dropout=latent_rnn_dropout_prob,
        auto_reg=auto_reg,
        teacher_forcing=teacher_forcing,
        type=context_type,
    )
    if train:
        trainer = LatentRNNTrainer(
            dataset=folk_dataset_train, model=model, lr=lr, compute_dtype=compute_dtype,
            early_stopping=early_stop,
        )
        trainer.train_model(batch_size=batch_size, num_epochs=num_epochs,
                            plot=plot, log=log)
    else:
        model.init(jax.random.PRNGKey(1))
        model.load()
    tester = LatentRNNTester(dataset=folk_dataset_test, model=model)
    tester.test_model(batch_size=batch_size)


if __name__ == '__main__':
    main()
