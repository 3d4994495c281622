"""Native runtime tests: int4 pack/unpack, threaded quantize, tensor
container roundtrip (native lib when buildable, numpy fallback parity)."""

import numpy as np
import pytest

from mixdq_tpu import runtime
from mixdq_tpu.runtime import tensorstore


def test_native_lib_builds():
    lib = runtime.get_lib()
    # g++ is present in this image; the native path should build
    assert lib is not None


@pytest.mark.parametrize("n", [16, 17, 1023])
def test_pack_unpack_int4_roundtrip(n):
    rng = np.random.RandomState(0)
    codes = rng.randint(-8, 8, n).astype(np.int8)
    packed = runtime.pack_int4(codes)
    assert packed.nbytes == (n + 1) // 2
    back = runtime.unpack_int4(packed, n)
    np.testing.assert_array_equal(back, codes)


def test_pack_int4_matches_numpy_fallback():
    rng = np.random.RandomState(1)
    codes = rng.randint(-8, 8, 501).astype(np.int8)
    native = runtime.pack_int4(codes)
    # force fallback
    lib, runtime._lib, runtime._tried = runtime._lib, None, True
    try:
        fallback = runtime.pack_int4(codes)
    finally:
        runtime._lib, runtime._tried = lib, True
    np.testing.assert_array_equal(native, fallback)


def test_quantize_per_channel():
    rng = np.random.RandomState(2)
    w = rng.randn(64, 32).astype(np.float32)
    delta = (rng.rand(32).astype(np.float32) + 0.5) * 0.05
    got = runtime.quantize_per_channel(w, delta, n_bits=8)
    want = np.clip(np.round(w / delta[None]), -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got, want)


def test_tensorstore_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    tensors = {
        "a::w_int": rng.randint(-8, 8, (4, 6)).astype(np.int8),
        "b::scale": rng.rand(7).astype(np.float32),
        "c": rng.randn(3, 3, 2).astype(np.float32),
    }
    p = str(tmp_path / "t.mixdq")
    tensorstore.save_tensors(tensors, p, pack4_names={"a::w_int"})
    back = tensorstore.load_tensors(p)
    for k in tensors:
        np.testing.assert_allclose(np.asarray(back[k]), tensors[k],
                                   err_msg=k)


def test_deploy_ckpt_roundtrip(tmp_path):
    import jax.numpy as jnp
    from mixdq_tpu.quant.deploy import DeployEntry

    e = DeployEntry(
        kind="linear",
        w_int=jnp.asarray(np.random.RandomState(0).randint(-8, 8, (16, 8)),
                          jnp.int8),
        scale=jnp.ones(8), bias0=jnp.zeros(8),
        scale_inv=jnp.float32(10.0), zp_shifted=jnp.float32(-3.0))
    sp = DeployEntry(kind="conv_split", split=4, part0=e, part1=e)
    p = str(tmp_path / "d.mixdq")
    tensorstore.save_deploy_ckpt({"lin": e, "conv": sp}, p,
                                 w4_layers={"lin"})
    back = tensorstore.load_deploy_ckpt(p)
    assert back["lin"].kind == "linear"
    np.testing.assert_array_equal(np.asarray(back["lin"].w_int),
                                  np.asarray(e.w_int))
    assert back["conv"].kind == "conv_split" and back["conv"].split == 4
    np.testing.assert_array_equal(np.asarray(back["conv"].part0.w_int),
                                  np.asarray(e.w_int))
