"""Joint inpainting-evaluation harness
(reference test_reconstruction.py:56-361): loads the MeasureVAE, LatentRNN
and both AnticipationRNNs and reports inpainting NLL/accuracy for all on the
SAME stochastic splits (fixed number of target measures)."""
import click
import jax
import numpy as np

from inpaintnet_tpu.cli.common import dataset_options, standard_datasets
from inpaintnet_tpu.eval import AnticipationRNNTester, LatentRNNTester
from inpaintnet_tpu.models import (
    AnticipationRNNBaseline,
    ConstraintModelGaussianReg,
    LatentRNN,
    LatentRNNAblations,
    MeasureVAE,
)
from inpaintnet_tpu.train.metrics import mean_accuracy, mean_crossentropy_loss


def process_batch_data(batch, latent_rnn_tester, arnn_tester, num_target_measures=2):
    """Shared stochastic split -> (latent_rnn_batch, arnn_batch)
    (reference test_reconstruction.py:224-252)."""
    score_tensor = np.asarray(batch[0])
    metadata_tensor = np.asarray(batch[1])
    packed = latent_rnn_tester.split_score_stochastic(
        score_tensor, fix_num_target=num_target_measures
    )
    _, pm, _, _, _, _ = packed
    num_past = int(pm[0].sum())
    loc, start_tick, end_tick = arnn_tester.get_constraints_location(
        score_tensor, start_measure=num_past, num_measures=num_target_measures
    )
    b = score_tensor.shape[0]
    score = score_tensor.reshape(b, -1).astype(np.int32)
    md = metadata_tensor.reshape(b, score.shape[1], -1).astype(np.int32)
    arnn_batch = (score, md, loc.reshape(b, -1).astype(np.int32), start_tick, end_tick)
    return packed, arnn_batch


def _context_repeat_flags(score_2d, num_past, num_target, msl=24):
    """(B, num_target) bool — target measure j is an EXACT token copy of
    some context measure of its own window. On corpora with phrase forms
    (data/synthetic.py structured style) this splits the eval into
    "restated" measures — where a model can exploit long-range context —
    and "novel" ones it must model locally. The reference has no such
    probe; it sharpens the paper-style InpaintNet-vs-ARNN comparison."""
    b = score_2d.shape[0]
    meas = score_2d.reshape(b, -1, msl)
    flags = np.zeros((b, num_target), bool)
    for i in range(b):
        ctx = {m.tobytes() for j, m in enumerate(meas[i])
               if not num_past <= j < num_past + num_target}
        for j in range(num_target):
            flags[i, j] = meas[i, num_past + j].tobytes() in ctx
    return flags


def loss_and_acc_test(data_loader, latent_rnn_tester, arnn_tester,
                      arnn_baseline_tester=None, num_target_measures=2,
                      num_models=4, ablation_testers=None):
    """(reference test_reconstruction.py:255-357); adds a context-repeat
    accuracy breakdown per model (see _context_repeat_flags).

    ``ablation_testers`` — optional ``{name: LatentRNNTester}`` of
    LatentRNNAblations (past-only / future-only conditioning, reference
    train_inpaintnet_ablation.py:148) scored through the SAME stochastic
    splits and fixed-span protocol as the main models, so the paper-style
    comparison includes the ablation rows apples-to-apples."""
    ablation_testers = ablation_testers or {}
    sums = {k: 0.0 for k in (
        "latent_rnn_loss", "latent_rnn_acc", "arnn_loss", "arnn_acc",
        "arnn_baseline_loss", "arnn_baseline_acc")}
    for name in ablation_testers:
        sums[f"{name}_loss"] = sums[f"{name}_acc"] = 0.0
    grp = {m: np.zeros(4) for m in (
        "latent_rnn", "arnn", "arnn_baseline", *ablation_testers)}
    # per model: [repeat_correct, repeat_total, novel_correct, novel_total]
    nb = 0
    msl = 24
    key = jax.random.PRNGKey(0)
    for i, batch in enumerate(data_loader):
        latent_batch, arnn_batch = process_batch_data(
            batch, latent_rnn_tester, arnn_tester, num_target_measures
        )
        score, md, loc, start_tick, end_tick = arnn_batch
        num_past = start_tick // msl
        flags = _context_repeat_flags(score, num_past, num_target_measures,
                                      msl)

        def accumulate(name, corr):
            """corr: (B, num_target, msl) bool prediction-correct."""
            rep = flags[:, :, None]
            grp[name] += np.array([
                (corr & rep).sum(), np.broadcast_to(rep, corr.shape).sum(),
                (corr & ~rep).sum(), np.broadcast_to(~rep, corr.shape).sum(),
            ])

        def arnn_eval(name, tester):
            logits, _ = tester._inpaint(
                tester.model.params, score, md, loc, jax.random.fold_in(key, i)
            )
            span = logits[:, start_tick:end_tick]
            tgt = score[:, start_tick:end_tick]
            b = span.shape[0]
            pred = np.asarray(np.argmax(span, axis=-1))
            accumulate(name, (pred == tgt).reshape(
                b, num_target_measures, msl
            ))
            return (
                float(mean_crossentropy_loss(span, tgt)),
                float(mean_accuracy(span, tgt)),
            )

        if num_models >= 1:
            l, a = arnn_eval("arnn", arnn_tester)
            sums["arnn_loss"] += l
            sums["arnn_acc"] += a
        def latent_eval(name, tester):
            past, pm, future, fm, target, tm = latent_batch
            weights, _, _ = tester._fwd(
                tester.model.params,
                tester.model.vae_model.params,
                past, pm, future, fm, target, tm, jax.random.fold_in(key, i),
            )
            tick_mask = tm[:, :, None] * np.ones((1, 1, 24))
            sums[f"{name}_loss"] += float(
                mean_crossentropy_loss(weights, target, mask=tick_mask)
            )
            sums[f"{name}_acc"] += float(
                mean_accuracy(weights, target, mask=tick_mask)
            )
            # the packed target rows 0..num_target-1 are measures
            # num_past..num_past+num_target-1 (fixed-size stochastic split)
            pred = np.asarray(np.argmax(weights, axis=-1))
            corr = (pred == np.asarray(target))[:, :num_target_measures]
            accumulate(name, corr)

        if num_models >= 2:
            latent_eval("latent_rnn", latent_rnn_tester)
        for name, tester in ablation_testers.items():
            latent_eval(name, tester)
        if num_models >= 4 and arnn_baseline_tester is not None:
            l, a = arnn_eval("arnn_baseline", arnn_baseline_tester)
            sums["arnn_baseline_loss"] += l
            sums["arnn_baseline_acc"] += a
        nb += 1
    nb = max(nb, 1)
    out = {k: v / nb for k, v in sums.items()}
    tot = grp["arnn"][1] + grp["arnn"][3]
    if tot:
        out["repeat_fraction"] = grp["arnn"][1] / tot
        for name, g in grp.items():
            if g[1]:
                out[f"{name}_acc_repeat"] = g[0] / g[1]
            if g[3]:
                out[f"{name}_acc_novel"] = g[2] / g[3]
    return out


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
@click.option('--batch_size', default=512)
@click.option('--num_target', default=2, help='fixed number of target measures')
@click.option('--num_models', default=4)
@click.option('--include_ablations', default='',
              help='comma list of LatentRNNAblations context types '
                   '("past","future") to score as extra rows; their '
                   'checkpoints must exist (train_inpaintnet_ablation.py '
                   'or benchmarks/full_schedule.py ablation phase)')
@dataset_options
def main(note_embedding_dim, metadata_embedding_dim, num_encoder_layers,
         encoder_hidden_size, encoder_dropout_prob, has_metadata,
         latent_space_dim, num_decoder_layers, decoder_hidden_size,
         decoder_dropout_prob, num_latent_rnn_layers, latent_rnn_hidden_size,
         latent_rnn_dropout_prob, num_layers, lstm_hidden_size, dropout_lstm,
         input_dropout, linear_hidden_size, batch_size, num_target,
         num_models, include_ablations, dataset_name, corpus_dir, cache_dir):
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

    latent_rnn = LatentRNN(
        dataset=folk_dataset_train, vae_model=vae_model,
        num_rnn_layers=num_latent_rnn_layers,
        rnn_hidden_size=latent_rnn_hidden_size,
        dropout=latent_rnn_dropout_prob, auto_reg=False, teacher_forcing=True,
    )
    latent_rnn.init(jax.random.PRNGKey(1))
    latent_rnn.load()

    ablation_testers = {}
    for ctx_type in [s for s in include_ablations.split(',') if s]:
        abl = LatentRNNAblations(
            dataset=folk_dataset_train, vae_model=vae_model,
            num_rnn_layers=num_latent_rnn_layers,
            rnn_hidden_size=latent_rnn_hidden_size,
            dropout=latent_rnn_dropout_prob, auto_reg=False,
            teacher_forcing=True, type=ctx_type,
        )
        abl.init(jax.random.PRNGKey(1))
        abl.load()
        ablation_testers[f"ablation_{ctx_type}"] = LatentRNNTester(
            folk_dataset_test, abl
        )

    def build_arnn(cls):
        m = cls(
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
        m.init(jax.random.PRNGKey(2))
        m.load()
        return m

    arnn = build_arnn(ConstraintModelGaussianReg)
    arnn_baseline = build_arnn(AnticipationRNNBaseline)

    latent_tester = LatentRNNTester(folk_dataset_test, latent_rnn)
    arnn_tester = AnticipationRNNTester(folk_dataset_test, arnn)
    arnn_baseline_tester = AnticipationRNNTester(folk_dataset_test, arnn_baseline)

    _, _, gen_test = folk_dataset_test.data_loaders(
        batch_size=batch_size, split=(0.01, 0.01)
    )
    results = loss_and_acc_test(
        gen_test, latent_tester, arnn_tester, arnn_baseline_tester,
        num_target_measures=num_target, num_models=num_models,
        ablation_testers=ablation_testers,
    )
    for k, v in results.items():
        print(f"{k}: {v}")


if __name__ == '__main__':
    main()
