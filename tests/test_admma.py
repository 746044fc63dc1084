"""ADMMA (learned projection) tests: offline training converges, online
train-mode decoding matches exact ADMM (the teacher drives the decode,
reference admm.py:96-99), and a trained model decodes in eval mode."""

import numpy as np
import jax.numpy as jnp
import pytest

from ldpc_decoders_tpu import get_code
from ldpc_decoders_tpu.channels import bsc
from ldpc_decoders_tpu.decoders.admm import ADMMDecoder
from ldpc_decoders_tpu.decoders.admma import (
    ADMMADecoder,
    ckpt_path,
    load_params,
    mlp_apply,
    train_offline,
)
from ldpc_decoders_tpu.ops.projection import project_parity_polytope


@pytest.fixture(scope="module")
def hamming():
    return get_code("7_4_hamming")


@pytest.fixture(scope="module")
def trained_cache(tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("cache"))
    # Hamming(7,4) checks have regular degree 4.
    train_offline(4, [64, 64], steps=1500, batch=512, cache_dir=cache,
                  log_every=0)
    return cache


def test_offline_training_approximates_projection(trained_cache):
    params = load_params(ckpt_path(trained_cache, 4, [64, 64]))
    rng = np.random.default_rng(0)
    x = rng.random((256, 4)).astype(np.float32)
    y = np.asarray(project_parity_polytope(jnp.asarray(x)))
    y_hat = np.asarray(mlp_apply(params, jnp.asarray(x)))
    assert np.mean((y - y_hat) ** 2) < 5e-3


def test_train_mode_matches_exact_admm(hamming, tmp_path):
    gamma = np.asarray(bsc.llr(jnp.asarray(hamming.cb), 0.05))
    exact = ADMMDecoder(hamming.graph, max_iter=30)
    learned = ADMMADecoder(hamming.graph, max_iter=30, train=True,
                           layers=[16], cache_dir=str(tmp_path))
    p0 = learned.params[0]["w"].copy()
    x_e, it_e = exact.decode(jnp.asarray(gamma))
    x_a, it_a = learned.decode(jnp.asarray(gamma))
    np.testing.assert_array_equal(np.asarray(x_e), np.asarray(x_a))
    np.testing.assert_array_equal(np.asarray(it_e), np.asarray(it_a))
    # Online training stepped the parameters inside the decode loop.
    assert not np.allclose(np.asarray(p0), np.asarray(learned.params[0]["w"]))
    path = learned.save()
    assert path.endswith("model_4-16-4.npz")


def test_eval_mode_decodes_codewords(hamming, trained_cache):
    dec = ADMMADecoder(hamming.graph, max_iter=100, train=False,
                       layers=[64, 64], cache_dir=trained_cache)
    gamma = np.asarray(bsc.llr(jnp.asarray(hamming.cb), 0.05))
    x_hat, _ = dec.decode(jnp.asarray(gamma))
    ok = (np.asarray(x_hat) == hamming.cb).all(axis=1).mean()
    assert ok >= 0.75, ok


def test_eval_mode_apprx_switch_falls_back_to_exact(hamming, trained_cache):
    """apprx=N: approximate projection for the first N iterations, exact
    beyond (reference admm.py:101-104) — with the fallback, decoding a
    clean codeword must finish exactly."""
    dec = ADMMADecoder(hamming.graph, max_iter=-1, iter_cap=500, train=False,
                       apprx=3, layers=[64, 64], cache_dir=trained_cache)
    gamma = np.asarray(bsc.llr(jnp.asarray(hamming.cb), 0.05))
    x_hat, _ = dec.decode(jnp.asarray(gamma))
    np.testing.assert_array_equal(np.asarray(x_hat), hamming.cb)


def test_admma_requires_regular_degree():
    code = get_code("4_2_test")  # degrees 2,3,2
    with pytest.raises(ValueError):
        ADMMADecoder(code.graph, train=True)


def test_harness_train_mode_persists_parameters(hamming, tmp_path):
    """Regression: online training through the harness must actually
    accumulate into host-side parameters across chunks (a jitted chunk
    closure would bake the initial weights in and leak tracers)."""
    import numpy as np
    from ldpc_decoders_tpu.harness import MonteCarloRunner, RunConfig

    cfg = RunConfig(channel="bsc", code="7_4_hamming", decoder="ADMMA",
                    params=[0.05], codeword=1, min_wec=10, batch=128,
                    max_iter=20, train=True, layers=[16],
                    cache_dir=str(tmp_path), log_freq=1e9)
    runner = MonteCarloRunner(cfg)
    p0 = np.asarray(runner.dec.dec.params[0]["w"]).copy()
    runner.run()
    p1 = np.asarray(runner.dec.dec.params[0]["w"])  # must be concrete
    assert not np.allclose(p0, p1), "training did not persist"
    path = runner.dec.dec.save()
    assert path.endswith(".npz")
