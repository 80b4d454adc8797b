"""Heterogeneous-batch serving (`InpaintingEngine.inpaint_hetero`) and the
HTTP server's dynamic request coalescing (`server.py _Batcher`).

The coalescing contract: the compiled serving program takes per-row
past/future buffers + validity masks (one compilation serves every split
shape) and per-row PRNG keys, so a request's response is BIT-IDENTICAL
whether it runs solo or shares a device batch with arbitrary other
requests — dynamic batching is a pure throughput knob.
"""
import http.client
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inpaintnet_tpu.models import LatentRNN, MeasureVAE
from inpaintnet_tpu.serve import InpaintingEngine
from inpaintnet_tpu.server import InpaintingServer

V = 30


class _DS:
    note2index_dicts = [{f"t{i}": i for i in range(V)}]

    def __repr__(self):
        return "ds"


def _models(auto_reg=False):
    vae = MeasureVAE(_DS(), note_embedding_dim=8, num_encoder_layers=2,
                     encoder_hidden_size=16, latent_space_dim=12,
                     num_decoder_layers=2, decoder_hidden_size=16)
    vae.init(jax.random.PRNGKey(0))
    m = LatentRNN(_DS(), vae, num_rnn_layers=2, rnn_hidden_size=16,
                  dropout=0.5, auto_reg=auto_reg)
    m.init(jax.random.PRNGKey(1))
    return m


@pytest.fixture(scope="module")
def engine():
    # ONE bucket so solo and coalesced requests share the compiled shape
    # (bit-exactness across bucket sizes is not part of the contract)
    return InpaintingEngine(_models(), batch_buckets=(8,), dtype="float32")


def _toks(b, m, seed):
    return np.random.RandomState(seed).randint(0, V, (b, m, 24)).astype(
        np.int32
    )


def _reqs():
    return [
        {"tokens": _toks(2, 16, 0), "start_measure": 8, "num_measures": 2,
         "seed": 5},
        {"tokens": _toks(3, 12, 1), "start_measure": 4, "num_measures": 3,
         "seed": 9},
        {"tokens": _toks(1, 16, 2), "start_measure": 2, "num_measures": 1},
    ]


def test_hetero_solo_equals_coalesced(engine):
    """THE contract: each request's tokens are identical whether it runs
    alone or packed with others (different spans, widths, batch rows)."""
    reqs = _reqs()
    coalesced = engine.inpaint_hetero(reqs)
    for req, got in zip(reqs, coalesced):
        solo = engine.inpaint_hetero([req])[0]
        np.testing.assert_array_equal(got, solo)


def test_hetero_shapes_and_context_preserved(engine):
    reqs = _reqs()
    outs = engine.inpaint_hetero(reqs)
    assert len(outs) == len(reqs)
    for req, out in zip(reqs, outs):
        t = req["tokens"]
        s, n = req["start_measure"], req["num_measures"]
        assert out.shape == t.shape
        np.testing.assert_array_equal(out[:, :s], t[:, :s])
        np.testing.assert_array_equal(out[:, s + n:], t[:, s + n:])
        assert out.min() >= 0 and out.max() < V


def test_hetero_deterministic_and_seed_sensitivity(engine):
    reqs = _reqs()
    a = engine.inpaint_hetero(reqs)
    b = engine.inpaint_hetero(reqs)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # a different seed for one request changes ONLY that request's span
    reqs2 = [dict(r) for r in reqs]
    reqs2[0]["seed"] = 6
    c = engine.inpaint_hetero(reqs2)
    assert not np.array_equal(a[0], c[0])
    np.testing.assert_array_equal(a[1], c[1])
    np.testing.assert_array_equal(a[2], c[2])


def test_int8_hetero_solo_equals_coalesced(monkeypatch):
    """Round-5: the int8 decode kernel's quant bound is PER ROW
    (ops/decode_pallas.py), so the solo == coalesced bit-equality
    contract holds STRUCTURALLY for the TPU serving default dtype —
    not just the bf16/f32 paths."""
    monkeypatch.setenv("INPAINTNET_PALLAS_INTERPRET", "1")
    from inpaintnet_tpu.models import measure_vae as mv

    monkeypatch.setattr(mv.Encoder, "_use_pallas", lambda self, p: True)
    monkeypatch.setattr(
        mv.HierarchicalDecoder, "_use_pallas_decode", lambda self, p: True
    )
    eng = InpaintingEngine(_models(), batch_buckets=(8,), dtype="int8")
    reqs = _reqs()
    coalesced = eng.inpaint_hetero(reqs)
    for req, got in zip(reqs, coalesced):
        solo = eng.inpaint_hetero([req])[0]
        np.testing.assert_array_equal(got, solo)


def test_hetero_rejects_oversize(engine):
    with pytest.raises(ValueError, match="rows"):
        engine.inpaint_hetero([{
            "tokens": _toks(9, 16, 0), "start_measure": 2,
            "num_measures": 1,
        }])
    assert engine.inpaint_hetero([]) == []


@pytest.fixture(scope="module")
def auto_engine():
    return InpaintingEngine(_models(auto_reg=True), batch_buckets=(8,),
                            dtype="float32")


def test_hetero_autoreg_solo_equals_coalesced(auto_engine):
    """Round-4: the autoregressive scan threads per-row keys (context +
    per-step re-encode streams split from each row's key inside
    LatentRNN.apply), so auto_reg requests coalesce bit-exactly too."""
    reqs = _reqs()
    coalesced = auto_engine.inpaint_hetero(reqs)
    for req, got in zip(reqs, coalesced):
        solo = auto_engine.inpaint_hetero([req])[0]
        np.testing.assert_array_equal(got, solo)
    # deterministic; span-only edits; seed sensitivity
    again = auto_engine.inpaint_hetero(reqs)
    for x, y in zip(coalesced, again):
        np.testing.assert_array_equal(x, y)
    for req, out in zip(reqs, coalesced):
        t, s, n = req["tokens"], req["start_measure"], req["num_measures"]
        np.testing.assert_array_equal(out[:, :s], t[:, :s])
        np.testing.assert_array_equal(out[:, s + n:], t[:, s + n:])
    reqs2 = [dict(r) for r in reqs]
    reqs2[0]["seed"] = 6
    c = auto_engine.inpaint_hetero(reqs2)
    assert not np.array_equal(coalesced[0], c[0])
    np.testing.assert_array_equal(coalesced[1], c[1])


def test_autoreg_variations_via_hetero(auto_engine):
    """auto_reg inpaint_variations rides ONE hetero call when the tiled
    rows fit a bucket: distinct draws per variation, deterministic, and
    variation 0 == the corresponding tiled hetero row."""
    toks = _toks(2, 16, 3)
    out = auto_engine.inpaint_variations(toks, 8, 2, num_variations=3,
                                         seed=11)
    assert out.shape == (3, 2, 16, 24)
    assert not np.array_equal(out[0], out[1])
    again = auto_engine.inpaint_variations(toks, 8, 2, num_variations=3,
                                           seed=11)
    np.testing.assert_array_equal(out, again)
    # equivalent tiled hetero request gives the same rows
    tiled = np.tile(toks, (3, 1, 1))
    het = auto_engine.inpaint_hetero([{
        "tokens": tiled, "start_measure": 8, "num_measures": 2,
        "seed": 11,
    }])[0]
    np.testing.assert_array_equal(out.reshape(6, 16, 24), het)


def test_hetero_compilation_cached_separately(engine):
    engine.inpaint_hetero(_reqs())
    assert ("hetero", 8) in engine._compiled


def test_hetero_mesh_equals_single_device(engine, devices8):
    """Per-row keys shard WITH their rows, so the mesh-sharded hetero
    program is row-for-row IDENTICAL to the single-device one (stronger
    than the batch-key path, which decorrelates shards via fold_in)."""
    from inpaintnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_devices=8)
    eng_mesh = InpaintingEngine(engine.model, batch_buckets=(8,),
                                dtype="float32", mesh=mesh)
    reqs = _reqs()
    single = engine.inpaint_hetero(reqs)
    sharded = eng_mesh.inpaint_hetero(reqs)
    for x, y in zip(single, sharded):
        np.testing.assert_array_equal(x, y)


# --------------------------------------------------------------------------- #
# HTTP dynamic batching
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def batch_server():
    engine = InpaintingEngine(_models(), batch_buckets=(8,),
                              dtype="float32")
    srv = InpaintingServer(engine, port=0, batching=True, max_wait_ms=1000)
    srv.start()
    # warm the hetero program so timed coalescing below isn't compile-bound
    engine.inpaint_hetero([{"tokens": _toks(1, 16, 99), "start_measure": 1,
                            "num_measures": 1}])
    yield srv
    srv.stop()


def _post(server, path, payload):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=120)
    conn.request("POST", path, body=json.dumps(payload),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_server_coalesces_concurrent_requests(batch_server):
    """Concurrent requests with different spans land in ONE device batch
    (the 1 s max_wait window dwarfs the enqueue skew), and every response
    equals its solo engine run bit-for-bit."""
    reqs = _reqs()
    calls_before = batch_server._batcher.calls
    results = [None] * len(reqs)

    def post(i):
        status, out = _post(batch_server, "/v1/inpaint", {
            "tokens": reqs[i]["tokens"].tolist(),
            "start_measure": reqs[i]["start_measure"],
            "num_measures": reqs[i]["num_measures"],
            **({"seed": reqs[i]["seed"]} if "seed" in reqs[i] else {}),
        })
        assert status == 200
        results[i] = np.asarray(out["tokens"])

    threads = [threading.Thread(target=post, args=(i,))
               for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert batch_server._batcher.calls == calls_before + 1, \
        "requests did not coalesce into one device batch"
    for req, got in zip(reqs, results):
        solo = batch_server.engine.inpaint_hetero([req])[0]
        np.testing.assert_array_equal(got, solo)


def test_variations_coalesce_with_inpaint_traffic(batch_server):
    """A variations request is nvar-tiled rows on the SAME hetero path as
    /v1/inpaint: it shares the device batch with concurrent inpaint
    traffic, its response is bit-identical solo vs coalesced, and
    variation 0 bit-equals the seeded /v1/inpaint response (shared
    per-row key prefix)."""
    toks = _toks(1, 16, 60)
    var_req = {"tokens": toks[0].tolist(), "start_measure": 6,
               "num_measures": 2, "num_variations": 3, "seed": 13}
    inp_req = {"tokens": _toks(2, 16, 61).tolist(), "start_measure": 4,
               "num_measures": 3, "seed": 14}
    # solo runs first (each its own batch)
    status, solo_var = _post(batch_server, "/v1/inpaint_variations",
                             var_req)
    assert status == 200
    status, solo_inp = _post(batch_server, "/v1/inpaint", inp_req)
    assert status == 200
    # variation 0 == the seeded inpaint response for the same request
    status, plain = _post(batch_server, "/v1/inpaint", {
        "tokens": var_req["tokens"], "start_measure": 6,
        "num_measures": 2, "seed": 13,
    })
    assert status == 200
    np.testing.assert_array_equal(
        np.asarray(solo_var["variations"])[0], np.asarray(plain["tokens"])
    )
    # distinct variations (per-row keys differ)
    v = np.asarray(solo_var["variations"])
    assert not np.array_equal(v[0], v[1])
    # now coalesced: both POSTs in one batcher window
    calls_before = batch_server._batcher.calls
    results = {}

    def post(name, path, payload):
        status, out = _post(batch_server, path, payload)
        assert status == 200, out
        results[name] = out

    threads = [
        threading.Thread(target=post,
                         args=("var", "/v1/inpaint_variations", var_req)),
        threading.Thread(target=post, args=("inp", "/v1/inpaint", inp_req)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert batch_server._batcher.calls == calls_before + 1, \
        "variations did not share the device batch with inpaint traffic"
    np.testing.assert_array_equal(np.asarray(results["var"]["variations"]),
                                  np.asarray(solo_var["variations"]))
    np.testing.assert_array_equal(np.asarray(results["inp"]["tokens"]),
                                  np.asarray(solo_inp["tokens"]))


def test_server_batching_stats_and_validation(batch_server):
    status, health = _post_get(batch_server, "/healthz")
    assert status == 200
    assert health["batching"]["calls"] >= 1
    assert health["batching"]["requests"] >= health["batching"]["calls"]
    # an invalid request 400s on its own — it must never reach the queue
    # where it could fail a shared batch
    status, out = _post(batch_server, "/v1/inpaint", {
        "tokens": _toks(1, 20, 0).tolist(), "start_measure": 2,
        "num_measures": 1,
    })
    assert status == 400 and "measures" in out["error"]


def _post_get(server, path):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
    conn.request("GET", path)
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_server_batched_ticks_roundtrip(batch_server):
    score = _toks(1, 16, 7).reshape(1, -1)
    status, out = _post(batch_server, "/v1/inpaint_ticks", {
        "tokens": score[0].tolist(), "start_tick": 24 * 6,
        "end_tick": 24 * 8, "seed": 3,
    })
    assert status == 200
    got = np.asarray(out["tokens"])
    assert got.shape == (16 * 24,)
    np.testing.assert_array_equal(got[: 24 * 6], score[0, : 24 * 6])
    np.testing.assert_array_equal(got[24 * 8:], score[0, 24 * 8:])


def test_client_roundtrip_npy_and_json(batch_server):
    """The client library against a live batching server: npy (default)
    and JSON transports return identical results; errors surface as
    ServerError with the server's message."""
    from inpaintnet_tpu.client import InpaintingClient, ServerError

    toks = _toks(2, 16, 11)
    with InpaintingClient("127.0.0.1", batch_server.port) as c:
        meta = c.meta()
        assert meta["measure_seq_len"] == 24
        assert c.health()["status"] == "ok"
        out = c.inpaint(toks, 6, 2, seed=4)
        assert out.shape == toks.shape
        np.testing.assert_array_equal(out[:, :6], toks[:, :6])
        with InpaintingClient("127.0.0.1", batch_server.port,
                              transport="json") as cj:
            np.testing.assert_array_equal(cj.inpaint(toks, 6, 2, seed=4),
                                          out)
        var = c.inpaint_variations(toks, 6, 2, num_variations=2, seed=1)
        assert var.shape == (2,) + toks.shape
        row = _toks(1, 16, 12).reshape(-1)
        got = c.inpaint_ticks(row, 24 * 6, 24 * 8, seed=2)
        assert got.shape == row.shape
        np.testing.assert_array_equal(got[: 24 * 6], row[: 24 * 6])
        with pytest.raises(ServerError) as ei:
            c.inpaint(toks, 0, 2)  # start_measure must be >= 1
        assert ei.value.status == 400


def test_warmup_covers_hetero_programs(engine):
    """warmup(hetero=True) pre-compiles the per-row-key programs the
    batching server dispatches to — no compile on the first coalesced
    batch."""
    engine.warmup(buckets=[8], variations=False, hetero=True)
    assert ("hetero", 8) in engine._compiled


def test_pin_bucket_bitwise_across_modes_and_load(batch_server):
    """With pin_bucket, a seeded request's tokens are identical whether
    the server batches or not, and whatever co-travellers it gets — every
    dispatch runs the same XLA executable."""
    engine = batch_server.engine
    toks = _toks(1, 16, 21)
    req = {"tokens": toks, "start_measure": 5, "num_measures": 2,
           "seed": 77}
    expected = engine.inpaint_hetero([req], bucket=8)[0]
    for batching in (False, True):
        srv = InpaintingServer(engine, port=0, batching=batching,
                               max_wait_ms=1.0, pin_bucket=8)
        srv.start()
        try:
            status, out = _post(srv, "/v1/inpaint", {
                "tokens": toks.tolist(), "start_measure": 5,
                "num_measures": 2, "seed": 77,
            })
            assert status == 200
            np.testing.assert_array_equal(np.asarray(out["tokens"]),
                                          expected)
        finally:
            srv.stop()
    with pytest.raises(ValueError, match="pin_bucket"):
        InpaintingServer(engine, port=0, pin_bucket=3)  # not a bucket


def test_request_validation_400s(batch_server):
    # too many measures for the variations endpoint (pre-engine check)
    status, out = _post(batch_server, "/v1/inpaint_variations", {
        "tokens": _toks(1, 20, 0).tolist(), "start_measure": 2,
        "num_measures": 1, "num_variations": 2,
    })
    assert status == 400 and "measures" in out["error"]
    # out-of-vocab token values (would silently wrap in the int16 wire
    # buffers if they reached the engine)
    bad = _toks(1, 16, 0)
    bad[0, 0, 0] = V + 100
    status, out = _post(batch_server, "/v1/inpaint", {
        "tokens": bad.tolist(), "start_measure": 2, "num_measures": 1,
    })
    assert status == 400 and "token values" in out["error"]


def test_stopped_batcher_fails_fast(engine):
    """submit() into a stopped batcher raises instead of hanging, and
    requests pending at stop time get an error, not a forever-wait."""
    srv = InpaintingServer(engine, port=0, batching=True, max_wait_ms=1.0)
    srv.start()
    srv.stop()
    with pytest.raises(RuntimeError, match="not running"):
        srv._batcher.submit({
            "tokens": _toks(1, 16, 0), "start_measure": 2,
            "num_measures": 1, "seed": 0,
        })


def test_metrics_endpoint(batch_server):
    """Prometheus-format /metrics: request counters, latency histogram,
    and (batching) coalesced-batch-size histogram."""
    _post(batch_server, "/v1/inpaint", {
        "tokens": _toks(1, 16, 33).tolist(), "start_measure": 2,
        "num_measures": 1,
    })
    conn = http.client.HTTPConnection("127.0.0.1", batch_server.port,
                                      timeout=60)
    conn.request("GET", "/metrics")
    resp = conn.getresponse()
    body = resp.read().decode()
    conn.close()
    assert resp.status == 200
    assert resp.getheader("Content-Type").startswith("text/plain")
    assert 'inpaintnet_requests_total{route="/v1/inpaint",status="200"}' \
        in body
    assert "inpaintnet_request_latency_ms_bucket" in body
    assert "inpaintnet_coalesced_batch_size_count" in body
    # histograms are cumulative and end with +Inf == count
    inf = [ln for ln in body.splitlines()
           if ln.startswith("inpaintnet_request_latency_ms_bucket")
           and 'le="+Inf"' in ln]
    assert inf and all(int(ln.rsplit(" ", 1)[1]) >= 1 for ln in inf)
    # GETs are metered too (the /metrics scrape above + this healthz)
    conn = http.client.HTTPConnection("127.0.0.1", batch_server.port,
                                      timeout=60)
    conn.request("GET", "/healthz")
    conn.getresponse().read()
    conn.request("GET", "/metrics")
    body = conn.getresponse().read().decode()
    conn.close()
    assert 'inpaintnet_requests_total{route="/healthz",status="200"}' in body
    assert 'inpaintnet_requests_total{route="/metrics",status="200"}' in body


def test_interpolate_ragged_tokens_is_400(batch_server):
    """The interpolate 'tokens' shorthand must map a ragged list to a 400
    like every other endpoint, not a 500 (advisor round-3 finding)."""
    status, out = _post(batch_server, "/v1/interpolate", {
        "tokens": [[1, 2], [3]], "num_points": 2,
    })
    assert status == 400 and "rectangular" in out["error"]


def test_batching_server_over_mesh(engine, devices8):
    """Batching composes with data-parallel serving: a server wrapping a
    mesh-sharded engine coalesces requests AND returns the exact
    single-device tokens (per-row keys shard with their rows)."""
    from inpaintnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_devices=8)
    eng_mesh = InpaintingEngine(engine.model, batch_buckets=(8,),
                                dtype="float32", mesh=mesh)
    srv = InpaintingServer(eng_mesh, port=0, batching=True,
                           max_wait_ms=1000)
    srv.start()
    try:
        reqs = _reqs()
        results = [None] * len(reqs)

        def post(i):
            status, out = _post(srv, "/v1/inpaint", {
                "tokens": reqs[i]["tokens"].tolist(),
                "start_measure": reqs[i]["start_measure"],
                "num_measures": reqs[i]["num_measures"],
                **({"seed": reqs[i]["seed"]} if "seed" in reqs[i] else {}),
            })
            assert status == 200
            results[i] = np.asarray(out["tokens"])

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert srv._batcher.calls == 1
        for req, got in zip(reqs, results):
            solo_single_device = engine.inpaint_hetero([req])[0]
            np.testing.assert_array_equal(got, solo_single_device)
    finally:
        srv.stop()


def test_interpolate_matches_vae_tester(engine):
    """The served interpolation equals VAETester.decode_mid_point (the
    reference capability, vae_tester.py:72-93) on the same weights, for
    any num_points through ONE padded compilation."""
    from inpaintnet_tpu.eval.vae_tester import VAETester

    vae = engine.model.vae_model
    tester = VAETester(_DS(), vae)
    rs = np.random.RandomState(3)
    a = rs.randint(0, V, (24,)).astype(np.int32)
    b = rs.randint(0, V, (24,)).astype(np.int32)
    for n in (1, 3):
        got = engine.interpolate(a, b, n)
        assert got.shape == (n + 2, 24)
        z1 = tester._encode_fn(vae.params, jnp.asarray(a[None])).loc[0]
        z2 = tester._encode_fn(vae.params, jnp.asarray(b[None])).loc[0]
        ref = np.asarray(tester.decode_mid_point(z1, z2, n)).reshape(
            n + 2, 24
        )
        np.testing.assert_array_equal(got, ref)
    # every num_points shares one compiled program (rows pad to a fixed
    # count; decode is row-independent so padding is exact)
    n_compiled = len(engine._compiled)
    engine.interpolate(a, b, 5)
    assert len(engine._compiled) == n_compiled


def test_interpolate_under_mesh(engine, devices8):
    """interpolate runs on a mesh engine (replicated params, plain jit)
    and equals the single-device result (deterministic argmax path)."""
    from inpaintnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_devices=8)
    eng_mesh = InpaintingEngine(engine.model, batch_buckets=(8,),
                                dtype="float32", mesh=mesh)
    rs = np.random.RandomState(5)
    a = rs.randint(0, V, (24,)).astype(np.int32)
    b = rs.randint(0, V, (24,)).astype(np.int32)
    np.testing.assert_array_equal(
        eng_mesh.interpolate(a, b, 2), engine.interpolate(a, b, 2)
    )


def test_interpolate_http_and_client(batch_server):
    from inpaintnet_tpu.client import InpaintingClient, ServerError

    rs = np.random.RandomState(4)
    a = rs.randint(0, V, (24,)).astype(np.int32)
    b = rs.randint(0, V, (24,)).astype(np.int32)
    direct = batch_server.engine.interpolate(a, b, 2)
    for transport in ("npy", "json"):
        with InpaintingClient("127.0.0.1", batch_server.port,
                              transport=transport) as c:
            np.testing.assert_array_equal(c.interpolate(a, b, 2), direct)
    status, out = _post(batch_server, "/v1/interpolate", {
        "measure_a": a.tolist(), "measure_b": b[:10].tolist(),
        "num_points": 2,
    })
    assert status == 400 and "measure_b" in out["error"]
    with InpaintingClient("127.0.0.1", batch_server.port) as c:
        with pytest.raises(ServerError) as ei:
            c.interpolate(a, b, 0)  # num_points must be >= 1
        assert ei.value.status == 400


def test_server_batches_autoreg(auto_engine):
    """Round-4: auto_reg engines coalesce too (per-row keys thread through
    the autoregressive scan) — concurrent requests through a batching
    server bit-equal their solo (non-batching) responses."""
    server = InpaintingServer(auto_engine, port=0, batching=True,
                              max_wait_ms=40)
    server.start()
    try:
        reqs = _reqs()
        solo = [auto_engine.inpaint_hetero([r])[0] for r in reqs]
        outs = [None] * len(reqs)

        def post(i):
            body = json.dumps({
                "tokens": reqs[i]["tokens"].tolist(),
                "start_measure": reqs[i]["start_measure"],
                "num_measures": reqs[i]["num_measures"],
                **({"seed": reqs[i]["seed"]} if "seed" in reqs[i] else {}),
            })
            conn = http.client.HTTPConnection("127.0.0.1", server.port)
            conn.request("POST", "/v1/inpaint", body,
                         {"Content-Type": "application/json"})
            outs[i] = np.asarray(
                json.loads(conn.getresponse().read())["tokens"]
            )
            conn.close()

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, req in enumerate(reqs):
            np.testing.assert_array_equal(outs[i], solo[i])
        assert server._batcher.calls >= 1
    finally:
        server.stop()
