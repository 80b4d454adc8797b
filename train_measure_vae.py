"""Train / evaluate MeasureVAE (reference train_measure_vae.py:12-131,
same flag set; extra --dataset_name/--corpus_dir/--cache_dir knobs)."""
import click

from inpaintnet_tpu.cli.common import dataset_options, standard_datasets
from inpaintnet_tpu.eval import VAETester
from inpaintnet_tpu.models import MeasureVAE
from inpaintnet_tpu.train import VAETrainer


@click.command()
@click.option('--note_embedding_dim', default=10, help='size of the note embeddings')
@click.option('--metadata_embedding_dim', default=2, help='size of the metadata embeddings')
@click.option('--num_encoder_layers', default=2, help='number of layers in encoder RNN')
@click.option('--encoder_hidden_size', default=512, help='hidden size of the encoder RNN')
@click.option('--encoder_dropout_prob', default=0.5, help='dropout prob between encoder RNN layers')
@click.option('--has_metadata', default=False, help='bool, True if data contains metadata')
@click.option('--latent_space_dim', default=256, help='dimension of latent space')
@click.option('--num_decoder_layers', default=2, help='number of layers in decoder RNN')
@click.option('--decoder_hidden_size', default=512, help='hidden size of the decoder RNN')
@click.option('--decoder_dropout_prob', default=0.5, help='dropout prob between decoder RNN layers')
@click.option('--batch_size', default=256, help='training batch size')
@click.option('--num_epochs', default=30, help='number of training epochs')
@click.option('--train/--test', default=True, help='train or evaluate the model')
@click.option('--plot/--no_plot', default=False, help='plot the training log')
@click.option('--log/--no_log', default=True, help='log epoch metrics')
@click.option('--lr', default=1e-4, help='learning rate')
@click.option('--compute_dtype', default=None,
              type=click.Choice(['bfloat16', 'float32']),
              help='mixed-precision compute dtype (fp32 master params)')
@dataset_options
def main(note_embedding_dim, metadata_embedding_dim, num_encoder_layers,
         encoder_hidden_size, encoder_dropout_prob, has_metadata,
         latent_space_dim, num_decoder_layers, decoder_hidden_size,
         decoder_dropout_prob, batch_size, num_epochs, train, plot, log, lr,
         compute_dtype, dataset_name, corpus_dir, cache_dir):
    folk_dataset, folk_dataset_test = standard_datasets(
        dataset_name, cache_dir=cache_dir, corpus_dir=corpus_dir
    )
    model = MeasureVAE(
        dataset=folk_dataset,
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
    if train:
        trainer = VAETrainer(dataset=folk_dataset, model=model, lr=lr, compute_dtype=compute_dtype)
        trainer.train_model(batch_size=batch_size, num_epochs=num_epochs,
                            plot=plot, log=log)
    else:
        import jax
        model.init(jax.random.PRNGKey(0))
        model.load()
    tester = VAETester(dataset=folk_dataset_test, model=model)
    tester.test_model()


if __name__ == '__main__':
    main()
