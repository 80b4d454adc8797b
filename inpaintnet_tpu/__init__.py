"""inpaintnet_tpu — a TPU-native framework for musical score inpainting.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of InpaintNet
("Learning to Traverse Latent Spaces for Musical Score Inpainting",
Pati, Lerch, Hadjeres; ISMIR 2019 — reference implementation at
github.com/ashispati/InpaintNet):

- ``inpaintnet_tpu.data``   — offline corpus tokenizer (own ABC parser; no
  music21 dependency), tick-grid score<->tensor codecs, versioned tensor
  store, seeded splits, MIDI export.
- ``inpaintnet_tpu.ops``    — GRU/LSTM recurrences as ``lax.scan`` with
  time-batched MXU matmuls, Pallas fused kernels, reparameterized normals,
  categorical sampling.
- ``inpaintnet_tpu.models`` — MeasureVAE (bi-GRU encoder + hierarchical
  beat/tick decoder), LatentRNN (InpaintNet) + ablations, AnticipationRNN
  baseline + gaussian-reg variant.
- ``inpaintnet_tpu.train``  — Trainer classes mirroring the reference API
  (``Trainer.train_model(batch_size, num_epochs, plot, log)``), optax
  optimizers, config-addressed checkpoints incl. optimizer state.
- ``inpaintnet_tpu.parallel`` — ``jax.sharding.Mesh`` utilities; data/model
  parallel train steps via NamedSharding (XLA collectives over ICI).
- ``inpaintnet_tpu.eval``   — Tester classes (NLL/accuracy, inpainting
  generation, latent-space probes).
"""

__version__ = "0.1.0"
