"""Code model, file I/O and graph compilation tests."""

import numpy as np
import pytest

from ldpc_decoders_tpu import codes
from ldpc_decoders_tpu.codes.ensembles import rand_reg_ldpc
from ldpc_decoders_tpu.ops.graph import TannerGraph
from ldpc_decoders_tpu.utils.math import binary_vectors


@pytest.mark.parametrize("name", ["4_2_test", "6_2_3_ldpc", "7_4_hamming",
                                  "12_3_4_ldpc"])
def test_builtin_codes_valid(name):
    c = codes.get_code(name)
    assert ((c.cb @ c.parity_mtx.T) % 2).sum() == 0
    assert c.cb[0].sum() == 0
    assert c.get_n() == c.parity_mtx.shape[1]


def test_hamming_shape():
    c = codes.get_code("7_4_hamming")
    assert c.get_n() == 7 and c.get_k() == 4
    assert c.cb.shape == (16, 7)


def test_binary_vectors_order():
    bv = binary_vectors(3)
    assert bv.shape == (8, 3)
    assert (bv[0] == 0).all()
    assert (bv[1] == [0, 0, 1]).all()
    assert (bv[-1] == 1).all()


def test_parity_file_roundtrip(tmp_path):
    H = codes.get_code("12_3_4_ldpc").parity_mtx
    codes.save_parity_mtx(H, "rt_test", str(tmp_path))
    H2 = codes.load_parity_mtx(str(tmp_path / "rt_test.txt"))
    assert (H == H2).all()


def test_load_reference_format(tmp_path):
    # one line per check, 1-based indices
    (tmp_path / "tiny.txt").write_text("1 2\n2 3\n")
    H = codes.load_parity_mtx(str(tmp_path / "tiny.txt"))
    assert (H == [[1, 1, 0], [0, 1, 1]]).all()


def test_rand_reg_ldpc_degrees():
    rng = np.random.default_rng(0)
    H = rand_reg_ldpc(24, 3, 6, rng)
    assert H.shape == (12, 24)
    assert (H.sum(axis=0) == 3).all()
    assert (H.sum(axis=1) == 6).all()


def test_tanner_graph_roundtrip():
    import jax.numpy as jnp
    H = codes.get_code("7_4_hamming").parity_mtx
    g = TannerGraph.from_parity_mtx(H)
    assert g.n_edge == H.sum()
    msgs = jnp.arange(g.n_edge, dtype=jnp.float32) + 1.0
    # scatter(gather(x)) == x on both sides
    assert np.allclose(np.asarray(g.scatter_chk(g.gather_chk(msgs))), msgs)
    assert np.allclose(np.asarray(g.scatter_var(g.gather_var(msgs))), msgs)
    # sums match dense computation
    dense = np.zeros(H.shape)
    dense[np.nonzero(H)] = np.arange(g.n_edge) + 1.0
    assert np.allclose(np.asarray(g.sum_per_chk(msgs)), dense.sum(axis=1))
    assert np.allclose(np.asarray(g.sum_per_var(msgs)), dense.sum(axis=0))


def test_syndrome_ok_batched():
    import jax.numpy as jnp
    c = codes.get_code("7_4_hamming")
    g = c.graph
    cb = jnp.asarray(c.cb)
    ok = g.syndrome_ok(cb)
    assert bool(ok.all())
    bad = cb.at[:, 0].add(1).astype(jnp.int32) % 2
    # flipping one bit of a Hamming codeword always breaks some check
    assert not bool(g.syndrome_ok(bad).any())


def test_exclusive_reductions():
    import jax.numpy as jnp
    from ldpc_decoders_tpu.ops.graph import (exclusive_min, exclusive_sum,
                                             exclusive_prod_sign)
    x = jnp.array([[3.0, 1.0, 2.0, 5.0]])
    assert np.allclose(np.asarray(exclusive_sum(x)), [[8, 10, 9, 6]])
    assert np.allclose(np.asarray(exclusive_min(x)), [[1, 2, 1, 1]])
    s = jnp.array([[1.0, -1.0, -1.0, 1.0]])
    assert np.allclose(np.asarray(exclusive_prod_sign(s)), [[1, -1, -1, 1]])


def test_layout_permutations_roundtrip():
    import jax.numpy as jnp
    g = codes.get_code("4_2_test").graph  # mixed degrees: pads exercised
    msgs = jnp.arange(g.n_edge, dtype=jnp.float32) + 1.0
    chk = g.gather_chk(msgs, fill=-1.0)
    var = g.gather_var(msgs, fill=-1.0)
    # chk layout -> var layout must match the direct var gather.
    got_var = g.chk_to_var(chk, fill=-1.0)
    assert np.allclose(np.asarray(got_var), np.asarray(var))
    got_chk = g.var_to_chk(var, fill=-1.0)
    assert np.allclose(np.asarray(got_chk), np.asarray(chk))


REF_CODES_DIR = "/root/reference/data/codes"


def test_roundtrip_all_reference_code_files(tmp_path):
    """Every committed reference parity file parses, and save->load is the
    identity (format parity, reference codes.py:93-105 / 131-136)."""
    import os
    if not os.path.isdir(REF_CODES_DIR):
        pytest.skip("no reference data")
    files = sorted(f for f in os.listdir(REF_CODES_DIR)
                   if f.endswith(".txt"))
    assert len(files) >= 20
    for f in files:
        H = codes.load_parity_mtx(os.path.join(REF_CODES_DIR, f))
        assert H.ndim == 2 and H.min() >= 0 and H.max() == 1
        name = os.path.splitext(f)[0]
        codes.save_parity_mtx(H, name, str(tmp_path))
        H2 = codes.load_parity_mtx(str(tmp_path / f))
        assert (H == H2).all(), f


def test_margulis_loads_and_decodes(monkeypatch):
    """The (2640,1320) Margulis code — the reference's largest fixture —
    compiles and MSA-decodes a noiseless batch."""
    import os
    if not os.path.isdir(REF_CODES_DIR):
        pytest.skip("no reference data")
    monkeypatch.setenv("FILE_CODES_DIR", REF_CODES_DIR)
    c = codes.get_code("margulis")
    assert c.parity_mtx.shape == (1320, 2640)
    import jax.numpy as jnp
    from ldpc_decoders_tpu.decoders.bp import BPDecoder
    dec = BPDecoder(c.graph, "MSA", max_iter=5)
    llr = jnp.full((4, 2640), 5.0)  # all-zeros strongly believed
    x_hat, iters = dec.decode(llr)
    assert (np.asarray(x_hat) == 0).all()
    assert (np.asarray(iters) == 0).all()  # syndrome ok at init
