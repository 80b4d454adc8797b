"""Checkpoint-porting parity: build torch modules with the reference
architecture, port their state_dicts, and verify our forward passes
reproduce the torch outputs exactly (eval mode). This is the machinery that
lets reference-trained checkpoints be evaluated for NLL parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from inpaintnet_tpu.models.measure_vae import Encoder, HierarchicalDecoder
from inpaintnet_tpu.models.torch_port import (
    port_encoder,
    port_hierarchical_decoder,
)

V, E, H, L, Z, B = 30, 10, 32, 2, 16, 4


class TorchRefEncoder(nn.Module):
    """Reference MeasureVAE/encoder.py:9-134 architecture."""

    def __init__(self):
        super().__init__()
        self.note_embedding_layer = nn.Embedding(V, E)
        self.lstm = nn.GRU(E, H, num_layers=L, bidirectional=True, batch_first=True)
        self.linear_mean = nn.Sequential(
            nn.Linear(H * 2 * L, H * 2), nn.SELU(), nn.Linear(H * 2, Z)
        )
        self.linear_log_std = nn.Sequential(
            nn.Linear(H * 2 * L, H * 2), nn.SELU(), nn.Linear(H * 2, Z)
        )

    def forward(self, score):
        x = self.note_embedding_layer(score)
        batch = score.shape[0]
        hidden = torch.zeros(L * 2, batch, H)
        _, hidden = self.lstm(x, hidden)
        hidden = hidden.transpose(0, 1).contiguous().view(batch, -1)
        return self.linear_mean(hidden), self.linear_log_std(hidden)


class TorchRefDecoder(nn.Module):
    """Reference MeasureVAE/decoder.py:313-529 architecture (teacher-forced
    path only, eval mode)."""

    def __init__(self):
        super().__init__()
        self.note_embedding_layer = nn.Embedding(V, E)
        self.z_to_beat_rnn_input = nn.Sequential(nn.Linear(Z, H * L), nn.SELU())
        self.b_0 = nn.Parameter(torch.zeros(1))
        self.rnn_beat = nn.GRU(1, H, num_layers=L, batch_first=True)
        self.beat_emb_to_tick_rnn_hidden = nn.Sequential(
            nn.Linear(H, H * L), nn.SELU()
        )
        self.beat_emb_to_tick_rnn_input = nn.Sequential(nn.Linear(H, H), nn.SELU())
        self.x_0 = nn.Parameter(torch.zeros(E))
        self.rnn_tick = nn.GRU(E + H, H, num_layers=L, batch_first=True)
        self.tick_emb_to_note_emb = nn.Sequential(nn.Linear(H, V), nn.ReLU())

    def _hidden(self, flat):
        batch = flat.shape[0]
        return flat.view(batch, L, -1).transpose(0, 1).contiguous()

    def forward_tf(self, z, score):
        batch = z.shape[0]
        h_beat = self._hidden(self.z_to_beat_rnn_input(z))
        beat_in = self.b_0.unsqueeze(0).expand(batch, 4, 1)
        beat_out, _ = self.rnn_beat(beat_in, h_beat)
        weights = []
        tick_in = self.x_0.unsqueeze(0).expand(batch, E).unsqueeze(1)
        for i in range(4):
            hidden = self._hidden(self.beat_emb_to_tick_rnn_hidden(beat_out[:, i]))
            beat_ctx = self.beat_emb_to_tick_rnn_input(beat_out[:, i]).unsqueeze(1)
            for j in range(6):
                inp = torch.cat([tick_in, beat_ctx], 2)
                out, hidden = self.rnn_tick(inp, hidden)
                probs = self.tick_emb_to_note_emb(out[:, 0, :])
                weights.append(probs.unsqueeze(1))
                idx = score[:, i * 6 + j].unsqueeze(1)  # teacher forcing
                tick_in = self.note_embedding_layer(idx)
        return torch.cat(weights, 1)


def _prefix_sd(module, prefix):
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


def test_encoder_port_parity():
    torch.manual_seed(0)
    tenc = TorchRefEncoder().eval()
    params = port_encoder(_prefix_sd(tenc, "encoder"), num_layers=L)
    ours = Encoder(E, H, L, V, dropout=0.0, bidirectional=True, z_dim=Z)
    score = np.random.RandomState(0).randint(0, V, (B, 24))
    with torch.no_grad():
        t_mean, t_log_std = tenc(torch.from_numpy(score))
    dist = ours.apply(params, jnp.asarray(score), train=False)
    np.testing.assert_allclose(np.asarray(dist.loc), t_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.log(np.asarray(dist.scale)), t_log_std.numpy(), atol=1e-5
    )


def test_decoder_port_parity_teacher_forced():
    torch.manual_seed(1)
    tdec = TorchRefDecoder().eval()
    params = port_hierarchical_decoder(_prefix_sd(tdec, "decoder"), num_layers=L)
    ours = HierarchicalDecoder(E, V, Z, L, H, dropout=0.0)
    rs = np.random.RandomState(1)
    z = rs.randn(B, Z).astype(np.float32)
    score = rs.randint(0, V, (B, 24))
    with torch.no_grad():
        t_logits = tdec.forward_tf(torch.from_numpy(z), torch.from_numpy(score))
    j_logits, _ = ours.decode_teacher_forced(
        params, jnp.asarray(z), jnp.asarray(score), train=False,
        rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(), atol=1e-4)
