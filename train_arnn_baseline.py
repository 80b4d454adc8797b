"""Train / evaluate the AnticipationRNN baseline
(reference train_arnn_baseline.py:12-135, same flag set)."""
import click
import jax

from inpaintnet_tpu.cli.common import dataset_options, standard_datasets
from inpaintnet_tpu.eval import AnticipationRNNTester
from inpaintnet_tpu.models import AnticipationRNNBaseline
from inpaintnet_tpu.train import AnticipationRNNBaselineTrainer


@click.command()
@click.option('--note_embedding_dim', default=10, help='size of the note embeddings')
@click.option('--metadata_embedding_dim', default=2, help='size of the metadata embeddings')
@click.option('--num_layers', default=2, help='number of layers of the LSTMs')
@click.option('--lstm_hidden_size', default=256, help='hidden size of the LSTMs')
@click.option('--dropout_lstm', default=0.2, help='dropout between LSTM layers')
@click.option('--input_dropout', default=0.2, help='input (timestep) dropout')
@click.option('--linear_hidden_size', default=256, help='hidden size of the Linear layers')
@click.option('--batch_size', default=32, help='training batch size')
@click.option('--num_epochs', default=50, help='number of training epochs')
@click.option('--train/--test', default=True, help='train or evaluate the model')
@click.option('--log/--no_log', default=True, help='log epoch metrics')
@click.option('--lr', default=1e-4, help='learning rate')
@click.option('--plot/--no_plot', default=True, help='plot the training log')
@click.option('--teacher_forcing/--no_teacher_forcing', default=True, help='use teacher forcing')
@click.option('--early_stop/--no_early_stop', default=True, help='use early stopping')
@click.option('--compute_dtype', default=None,
              type=click.Choice(['bfloat16', 'float32']),
              help='mixed-precision compute dtype (fp32 master params)')
@dataset_options
def main(note_embedding_dim, metadata_embedding_dim, num_layers,
         lstm_hidden_size, dropout_lstm, input_dropout, linear_hidden_size,
         batch_size, num_epochs, train, log, lr, plot, teacher_forcing,
         early_stop, compute_dtype, dataset_name, corpus_dir, cache_dir):
    folk_dataset, folk_dataset_test = standard_datasets(
        dataset_name, cache_dir=cache_dir, corpus_dir=corpus_dir
    )
    model = AnticipationRNNBaseline(
        dataset=folk_dataset,
        note_embedding_dim=note_embedding_dim,
        metadata_embedding_dim=metadata_embedding_dim,
        num_layers=num_layers,
        num_lstm_constraints_units=lstm_hidden_size,
        num_lstm_generation_units=lstm_hidden_size,
        linear_hidden_size=linear_hidden_size,
        dropout_prob=dropout_lstm,
        dropout_input_prob=input_dropout,
        unary_constraint=True,
        teacher_forcing=teacher_forcing,
    )
    if train:
        trainer = AnticipationRNNBaselineTrainer(
            dataset=folk_dataset, model=model, lr=lr, compute_dtype=compute_dtype, early_stopping=early_stop,
        )
        trainer.train_model(batch_size=batch_size, num_epochs=num_epochs,
                            plot=plot, log=log)
    else:
        model.init(jax.random.PRNGKey(0))
        model.load()
    tester = AnticipationRNNTester(dataset=folk_dataset_test, model=model)
    tester.test_model(batch_size=512)


if __name__ == '__main__':
    main()
