"""Serving layer: checkpoint round-trip, static-shape bucketed batching,
and the stdlib HTTP front end (scasml_gp_tpu/serve.py). The reference has
no deployment subsystem at all (its trained GP dies with the process,
models/GP.py:191-192,600)."""

import json
import urllib.request

import jax
import numpy as np
import pytest

from scasml_gp_tpu.config import GPConfig
from scasml_gp_tpu.equations import SineNonlinear
from scasml_gp_tpu.gp.solver import GPSineNonlinear
from scasml_gp_tpu.picard import ScaSMLFullHistory
from scasml_gp_tpu.serve import (
    SurrogateServer,
    load_surrogate,
    save_surrogate,
    serve_http,
)

D = 4


@pytest.fixture(scope="module")
def trained_gp():
    eq = SineNonlinear(n_input=D + 1)
    gp = GPSineNonlinear(eq, GPConfig(gn_steps=8))
    x_dom, x_bdy = eq.generate_data(150, 40, key=jax.random.PRNGKey(0))
    gp.GPsolver(x_dom, x_bdy)
    return eq, gp


def test_checkpoint_round_trip(tmp_path, trained_gp):
    eq, gp = trained_gp
    path = str(tmp_path / "ckpt")
    save_surrogate(path, gp)
    gp2 = load_surrogate(path)
    assert type(gp2).__name__ == "GPSineNonlinear"
    assert gp2.config == gp.config
    x = eq.geometry().sample_domain(jax.random.PRNGKey(1), 64)
    np.testing.assert_allclose(
        np.asarray(gp2.predict(x)), np.asarray(gp.predict(x)), atol=1e-6
    )


def test_untrained_gp_refuses_checkpoint(tmp_path):
    eq = SineNonlinear(n_input=D + 1)
    gp = GPSineNonlinear(eq, GPConfig())
    with pytest.raises(ValueError, match="no trained state"):
        save_surrogate(str(tmp_path / "x"), gp)


def test_bucketed_predict_matches_direct(trained_gp):
    eq, gp = trained_gp
    server = SurrogateServer(gp, buckets=(64, 128))
    # 33 rows -> padded into the 64 bucket; per-row posterior is independent
    # of the padding, so values must match the direct call exactly
    x = eq.geometry().sample_domain(jax.random.PRNGKey(2), 33)
    np.testing.assert_allclose(
        server.predict(np.asarray(x)), np.asarray(gp.predict(x)), atol=1e-6
    )
    # 150 rows -> chunked through the 128 bucket (128 + padded 22)
    x = eq.geometry().sample_domain(jax.random.PRNGKey(3), 150)
    np.testing.assert_allclose(
        server.predict(np.asarray(x)), np.asarray(gp.predict(x)), atol=1e-6
    )
    st = server.stats()
    assert st["requests"] == 2 and st["rows"] == 183


def test_gradient_endpoint(trained_gp):
    eq, gp = trained_gp
    server = SurrogateServer(gp, buckets=(64,))
    x = eq.geometry().sample_domain(jax.random.PRNGKey(4), 17)
    out = server.gradient(np.asarray(x))
    assert out.shape == (17, D + 1)
    np.testing.assert_allclose(
        out, np.asarray(gp.compute_gradient(x)), atol=1e-6
    )


def test_solve_endpoint(trained_gp):
    eq, gp = trained_gp
    sca = ScaSMLFullHistory(eq, gp)
    server = SurrogateServer(gp, sca, buckets=(64,), n=2, rho=None, M=4)
    x = eq.geometry().sample_domain(jax.random.PRNGKey(5), 40)
    out = server.solve(np.asarray(x))
    assert out.shape == (40, 1) and np.isfinite(out).all()
    exact = np.asarray(eq.exact_solution(x))
    rel = np.linalg.norm(out - exact) / np.linalg.norm(exact)
    assert rel < 0.25, rel


def test_bad_shape_rejected(trained_gp):
    _, gp = trained_gp
    server = SurrogateServer(gp, buckets=(64,))
    with pytest.raises(ValueError, match="expected"):
        server.predict(np.zeros((4, D + 7), np.float32))


def test_http_front_end(trained_gp):
    eq, gp = trained_gp
    server = SurrogateServer(gp, buckets=(64,))
    httpd = serve_http(server, port=0)  # ephemeral port
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r) == {"ok": True}

        x = np.asarray(eq.geometry().sample_domain(jax.random.PRNGKey(6), 9))
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"points": x.tolist()}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            values = np.asarray(json.load(r)["values"])
        np.testing.assert_allclose(
            values, np.asarray(gp.predict(x)), atol=1e-5
        )

        # malformed request -> 400 with an error message, server stays up
        bad = urllib.request.Request(
            f"{base}/predict", data=b'{"points": [[1, 2]]}',
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(bad, timeout=30)
        assert err.value.code == 400

        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            assert json.load(r)["requests"] >= 1
    finally:
        httpd.shutdown()


def test_serve_mesh_sharded_surrogate(tmp_path, trained_gp):
    """A checkpoint trained anywhere can be served model-sharded: the
    reloaded GP gets a ('data','model') mesh and the bucketed server's
    predictions match the replicated ones."""
    from scasml_gp_tpu.parallel.mesh import make_mesh

    eq, gp = trained_gp
    path = str(tmp_path / "ckpt")
    save_surrogate(path, gp)
    gp_sharded = load_surrogate(path, mesh=make_mesh(1, 8))
    server = SurrogateServer(gp_sharded, buckets=(64,))
    x = eq.geometry().sample_domain(jax.random.PRNGKey(7), 50)
    np.testing.assert_allclose(
        server.predict(np.asarray(x)), np.asarray(gp.predict(x)), atol=2e-4
    )
