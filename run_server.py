"""Serve trained InpaintNet checkpoints over HTTP.

Framework addition (the reference has no serving layer — flask sits unused
in its environment.yml:8): loads the MeasureVAE + LatentRNN checkpoints
the training CLIs produced (same config-addressed flags —
script_gen_same_context.py loading pattern) and exposes
``inpaintnet_tpu.server.InpaintingServer`` endpoints:

    POST /v1/inpaint            POST /v1/inpaint_variations
    POST /v1/inpaint_ticks      GET /healthz        GET /v1/meta
    POST /v1/arnn/inpaint       (with --serve_arnn baseline|reg)

``--batching`` coalesces concurrent inpaint requests into one device
batch; ``--serve_arnn`` additionally loads an AnticipationRNN checkpoint
(the reference's second inpainting family). ``inpaintnet_tpu.client``
is the Python client.

Example:
    python run_server.py --port 8080 --serve_dtype int8 --warmup \
        --batching --serve_arnn baseline
    curl -s localhost:8080/v1/meta
"""
import click
import jax

from inpaintnet_tpu.cli.common import dataset_options, standard_datasets
from inpaintnet_tpu.models import LatentRNN, MeasureVAE
from inpaintnet_tpu.serve import InpaintingEngine
from inpaintnet_tpu.server import InpaintingServer


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
@click.option('--auto_reg/--no_auto_reg', default=False)
@click.option('--host', default='127.0.0.1')
@click.option('--port', default=8000)
@click.option('--serve_dtype', default='bfloat16',
              type=click.Choice(['float32', 'bfloat16', 'int8']))
@click.option('--batch_buckets', default='1,8,64,512',
              help='comma-separated engine batch buckets')
@click.option('--warmup/--no_warmup', default=False,
              help='pre-compile every bucket before accepting traffic')
@click.option('--batching/--no_batching', default=False,
              help='coalesce concurrent inpaint requests into one device '
                   'batch (non-autoregressive engines only; a response '
                   'never depends on which requests share its batch)')
@click.option('--max_wait_ms', default=5.0,
              help='batching: how long the first request of a batch waits '
                   'for co-travellers')
@click.option('--pin_bucket', default=None, type=int,
              help='dispatch every request/batch at this fixed bucket: '
                   'seeded responses become bit-identical under any load '
                   '(different buckets are different XLA executables), at '
                   'the cost of padded transfers')
@click.option('--serve_arnn', default='none',
              type=click.Choice(['none', 'baseline', 'reg']),
              help='also load an AnticipationRNN checkpoint (the '
                   "reference's second inpainting family) and serve it at "
                   'POST /v1/arnn/inpaint')
@click.option('--arnn_num_layers', default=2)
@click.option('--arnn_lstm_hidden_size', default=256)
@click.option('--arnn_linear_hidden_size', default=256)
@click.option('--arnn_metadata_embedding_dim', default=2)
@click.option('--arnn_dropout_lstm', default=0.2,
              help='must match the training flag (checkpoints are '
                   'config-addressed)')
@click.option('--arnn_input_dropout', default=0.2)
@click.option('--arnn_note_embedding_dim', default=None, type=int,
              help='defaults to --note_embedding_dim; set separately when '
                   'the ARNN was trained with a different size')
@click.option('--arnn_teacher_forcing/--arnn_no_teacher_forcing',
              default=True,
              help='must match the training flag (part of the checkpoint '
                   'name)')
@dataset_options
def main(note_embedding_dim, metadata_embedding_dim, num_encoder_layers,
         encoder_hidden_size, encoder_dropout_prob, has_metadata,
         latent_space_dim, num_decoder_layers, decoder_hidden_size,
         decoder_dropout_prob, num_latent_rnn_layers, latent_rnn_hidden_size,
         latent_rnn_dropout_prob, auto_reg, host, port, serve_dtype,
         batch_buckets, warmup, batching, max_wait_ms, pin_bucket,
         serve_arnn, arnn_num_layers, arnn_lstm_hidden_size,
         arnn_linear_hidden_size, arnn_metadata_embedding_dim,
         arnn_dropout_lstm, arnn_input_dropout, arnn_note_embedding_dim,
         arnn_teacher_forcing,
         dataset_name, corpus_dir, cache_dir):
    folk_dataset_train, _ = standard_datasets(
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

    model = LatentRNN(
        dataset=folk_dataset_train, vae_model=vae_model,
        num_rnn_layers=num_latent_rnn_layers,
        rnn_hidden_size=latent_rnn_hidden_size,
        dropout=latent_rnn_dropout_prob, auto_reg=auto_reg,
        teacher_forcing=True,
    )
    model.init(jax.random.PRNGKey(1))
    model.load()

    buckets = tuple(int(b) for b in batch_buckets.split(','))
    engine = InpaintingEngine(model, batch_buckets=buckets,
                              dtype=serve_dtype)

    arnn_engine = None
    if serve_arnn != 'none':
        from inpaintnet_tpu.models import (
            AnticipationRNNBaseline,
            ConstraintModelGaussianReg,
        )
        from inpaintnet_tpu.serve_arnn import ARNNServingEngine

        cls = (AnticipationRNNBaseline if serve_arnn == 'baseline'
               else ConstraintModelGaussianReg)
        arnn_model = cls(
            dataset=folk_dataset_train,
            note_embedding_dim=(arnn_note_embedding_dim
                                if arnn_note_embedding_dim is not None
                                else note_embedding_dim),
            metadata_embedding_dim=arnn_metadata_embedding_dim,
            num_layers=arnn_num_layers,
            num_lstm_constraints_units=arnn_lstm_hidden_size,
            num_lstm_generation_units=arnn_lstm_hidden_size,
            linear_hidden_size=arnn_linear_hidden_size,
            dropout_prob=arnn_dropout_lstm,
            dropout_input_prob=arnn_input_dropout,
            unary_constraint=True,
            teacher_forcing=arnn_teacher_forcing,
        )
        arnn_model.init(jax.random.PRNGKey(2))
        arnn_model.load()
        arnn_engine = ARNNServingEngine(
            arnn_model, batch_buckets=buckets,
            dtype=None if serve_dtype == 'float32' else 'bfloat16',
        )

    if warmup:
        print('warming up (compiling every bucket)...', flush=True)
        engine.warmup(hetero=batching)
        if arnn_engine is not None:
            arnn_engine.warmup(measures=16)
    server = InpaintingServer(engine, host=host, port=port, quiet=False,
                              batching=batching, max_wait_ms=max_wait_ms,
                              pin_bucket=pin_bucket,
                              arnn_engine=arnn_engine)
    print(f'serving on http://{host}:{server.port}', flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()


if __name__ == '__main__':
    main()
