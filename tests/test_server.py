"""HTTP serving front end (inpaintnet_tpu/server.py): endpoint contracts,
validation, and that responses match direct engine calls."""
import http.client
import json

import numpy as np
import jax
import pytest

from inpaintnet_tpu.models import LatentRNN, MeasureVAE
from inpaintnet_tpu.serve import InpaintingEngine
from inpaintnet_tpu.server import InpaintingServer

VOCAB = 30


class _DS:
    note2index_dicts = [{f"t{i}": i for i in range(VOCAB)}]

    def __repr__(self):
        return "ds"


@pytest.fixture(scope="module")
def server():
    vae = MeasureVAE(_DS(), note_embedding_dim=8, num_encoder_layers=2,
                     encoder_hidden_size=16, latent_space_dim=12,
                     num_decoder_layers=2, decoder_hidden_size=16)
    vae.init(jax.random.PRNGKey(0))
    m = LatentRNN(_DS(), vae, num_rnn_layers=2, rnn_hidden_size=16,
                  dropout=0.5, auto_reg=False)
    m.init(jax.random.PRNGKey(1))
    engine = InpaintingEngine(m, batch_buckets=(2,), dtype="float32")
    srv = InpaintingServer(engine, port=0)
    srv.start()
    yield srv
    srv.stop()


def _call(server, method, path, payload=None):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
    body = None if payload is None else json.dumps(payload)
    conn.request(method, path, body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def _tokens(batch=2, measures=16, seed=0):
    return np.random.RandomState(seed).randint(
        0, VOCAB, (batch, measures, 24)
    )


def test_healthz_and_meta(server):
    status, health = _call(server, "GET", "/healthz")
    assert status == 200 and health["status"] == "ok"
    status, meta = _call(server, "GET", "/v1/meta")
    assert status == 200
    assert meta["measure_seq_len"] == 24
    assert meta["vocab_size"] == VOCAB
    assert meta["batch_buckets"] == [2]


def test_inpaint_matches_engine_and_preserves_context(server):
    toks = _tokens()
    status, out = _call(server, "POST", "/v1/inpaint", {
        "tokens": toks.tolist(), "start_measure": 4, "num_measures": 3,
        "seed": 7,
    })
    assert status == 200
    got = np.asarray(out["tokens"])
    assert got.shape == toks.shape
    np.testing.assert_array_equal(got[:, :4], toks[:, :4])
    np.testing.assert_array_equal(got[:, 7:], toks[:, 7:])
    # non-batching servers still dispatch through the hetero per-row-key
    # path (responses must not depend on the batching flag)
    direct = server.engine.inpaint_hetero([
        {"tokens": toks, "start_measure": 4, "num_measures": 3, "seed": 7}
    ])[0]
    np.testing.assert_array_equal(got, direct)


def test_inpaint_single_example_rank(server):
    toks = _tokens(batch=1)[0]
    status, out = _call(server, "POST", "/v1/inpaint", {
        "tokens": toks.tolist(), "start_measure": 1, "num_measures": 2,
        "seed": 1,
    })
    assert status == 200
    got = np.asarray(out["tokens"])
    assert got.shape == toks.shape  # rank preserved (measures, 24)
    np.testing.assert_array_equal(got[:1], toks[:1])
    np.testing.assert_array_equal(got[3:], toks[3:])


def test_inpaint_rejects_empty_past(server):
    """start_measure=0 has no past measure to seed generation from
    (reference latent_rnn.py:148-151) -> 400, not an engine crash."""
    toks = _tokens()
    status, out = _call(server, "POST", "/v1/inpaint", {
        "tokens": toks.tolist(), "start_measure": 0, "num_measures": 2,
    })
    assert status == 400 and "start_measure" in out["error"]


def test_inpaint_seeds(server):
    toks = _tokens()
    _, a = _call(server, "POST", "/v1/inpaint", {
        "tokens": toks.tolist(), "start_measure": 4, "num_measures": 3,
        "seed": 3,
    })
    _, a2 = _call(server, "POST", "/v1/inpaint", {
        "tokens": toks.tolist(), "start_measure": 4, "num_measures": 3,
        "seed": 3,
    })
    _, b = _call(server, "POST", "/v1/inpaint", {
        "tokens": toks.tolist(), "start_measure": 4, "num_measures": 3,
        "seed": 4,
    })
    assert a["tokens"] == a2["tokens"]  # deterministic per seed
    assert a["tokens"] != b["tokens"]


def test_inpaint_variations_shape(server):
    toks = _tokens(batch=1)[0]
    status, out = _call(server, "POST", "/v1/inpaint_variations", {
        "tokens": toks.tolist(), "start_measure": 4, "num_measures": 2,
        "num_variations": 3, "seed": 5,
    })
    assert status == 200
    got = np.asarray(out["variations"])
    assert got.shape == (3,) + toks.shape
    for v in got:
        np.testing.assert_array_equal(v[:4], toks[:4])
        np.testing.assert_array_equal(v[6:], toks[6:])


def test_inpaint_ticks(server):
    flat = _tokens(batch=1).reshape(-1)
    status, out = _call(server, "POST", "/v1/inpaint_ticks", {
        "tokens": flat.tolist(), "start_tick": 48, "end_tick": 96,
        "seed": 2,
    })
    assert status == 200
    got = np.asarray(out["tokens"])
    assert got.shape == flat.shape
    np.testing.assert_array_equal(got[:48], flat[:48])
    np.testing.assert_array_equal(got[96:], flat[96:])


@pytest.mark.parametrize("payload,needle", [
    ({}, "tokens"),
    ({"tokens": [[1, 2], [3]]}, "rectangular"),
    ({"tokens": [[1, 2, 3]]}, "got shape"),
    ({"tokens": None, "start_measure": 0, "num_measures": 1}, "tokens"),
])
def test_inpaint_bad_requests(server, payload, needle):
    status, out = _call(server, "POST", "/v1/inpaint", payload)
    assert status == 400
    assert needle in out["error"]


def test_inpaint_range_validation(server):
    toks = _tokens().tolist()
    status, out = _call(server, "POST", "/v1/inpaint", {
        "tokens": toks, "start_measure": 15, "num_measures": 3,
    })
    assert status == 400 and "start_measure" in out["error"]
    status, out = _call(server, "POST", "/v1/inpaint", {
        "tokens": toks, "start_measure": 0,
        "num_measures": 99,
    })
    assert status == 400 and "num_measures" in out["error"]


def test_inpaint_ticks_alignment_validation(server):
    flat = _tokens(batch=1).reshape(-1).tolist()
    status, out = _call(server, "POST", "/v1/inpaint_ticks", {
        "tokens": flat, "start_tick": 50, "end_tick": 96,
    })
    assert status == 400 and "aligned" in out["error"]


def test_unknown_path(server):
    status, out = _call(server, "GET", "/nope")
    assert status == 404
    status, out = _call(server, "POST", "/v1/nope", {})
    assert status == 404


def test_malformed_json(server):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
    conn.request("POST", "/v1/inpaint", body="{not json",
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    assert resp.status == 400 and "error" in out


def _call_npy(server, path_query, arr):
    import io
    buf = io.BytesIO()
    np.save(buf, arr)
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
    conn.request("POST", path_query, body=buf.getvalue(),
                 headers={"Content-Type": "application/x-npy"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    if resp.status == 200:
        return 200, np.load(io.BytesIO(data))
    return resp.status, json.loads(data)


def test_npy_transport_matches_json_and_engine(server):
    toks = _tokens()
    status, got = _call_npy(
        server, "/v1/inpaint?start_measure=4&num_measures=3&seed=7", toks
    )
    assert status == 200
    # non-batching servers still dispatch through the hetero per-row-key
    # path (responses must not depend on the batching flag)
    direct = server.engine.inpaint_hetero([
        {"tokens": toks, "start_measure": 4, "num_measures": 3, "seed": 7}
    ])[0]
    np.testing.assert_array_equal(got, direct)
    _, via_json = _call(server, "POST", "/v1/inpaint", {
        "tokens": toks.tolist(), "start_measure": 4, "num_measures": 3,
        "seed": 7,
    })
    np.testing.assert_array_equal(got, np.asarray(via_json["tokens"]))


def test_npy_transport_validation(server):
    toks = _tokens()
    status, out = _call_npy(
        server, "/v1/inpaint?start_measure=4&num_measures=3&bogus=1", toks
    )
    assert status == 400 and "bogus" in out["error"]
    status, out = _call_npy(
        server, "/v1/inpaint?start_measure=4&num_measures=3",
        toks.astype(np.float32),
    )
    assert status == 400 and "integer" in out["error"]
    # non-npy garbage body
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
    conn.request("POST", "/v1/inpaint?start_measure=4&num_measures=3",
                 body=b"garbage", headers={"Content-Type": "application/x-npy"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    assert resp.status == 400 and "npy" in out["error"]
