"""Real-weight fixture tests against the reference's in-tree artifacts.

The only real-weight artifact shipped inside the reference repo is
``kernels/bos_pre_computed.pt`` — the FP16 first-token (BoS) outputs of
every SDXL-Turbo cross-attn k/v projection, computed from the real CLIP
embeddings + real UNet weights (generation snippet at
quantize_sdxl.py:512-520; consumed at nn/Linear.py:178-194). These tests
prove our converter + deploy wiring consume the real schema, not just
synthetic lookalikes.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

REF_BOS = "/root/reference/kernels/bos_pre_computed.pt"
FIXTURE_LAYERS = os.path.join(os.path.dirname(__file__),
                              "fixtures_sdxl_turbo_layers.txt")

torch = pytest.importorskip("torch")
needs_artifact = pytest.mark.skipif(not os.path.exists(REF_BOS),
                                    reason="reference artifact unavailable")


@pytest.fixture(scope="module")
def bos_raw():
    return torch.load(REF_BOS, map_location="cpu")


@needs_artifact
def test_bos_artifact_schema(bos_raw):
    """The real artifact: 140 cross-attn k/v entries, fp16 [1, 1, N]
    with N = the SDXL inner dims (640 at 32x32 levels, 1280 at 16x16)."""
    assert len(bos_raw) == 140
    shapes = {}
    for name, v in bos_raw.items():
        assert ".attn2.to_k" in name or ".attn2.to_v" in name, name
        assert v.dtype == torch.float16
        assert v.ndim == 3 and v.shape[:2] == (1, 1), (name, v.shape)
        shapes[v.shape[-1]] = shapes.get(v.shape[-1], 0) + 1
    assert shapes == {640: 20, 1280: 120}


@needs_artifact
def test_bos_artifact_converts_and_matches_arch(bos_raw):
    """convert_bos_precomputed maps the real names/shapes into our
    canonical layer-name space — every entry must name a quantizable
    layer of our SDXL-Turbo UNet (the 794-layer arch-dump fixture)."""
    from mixdq_tpu.utils.torch_convert import convert_bos_precomputed

    bos = convert_bos_precomputed(
        {k: v.numpy() for k, v in bos_raw.items()})
    assert len(bos) == 140
    our_layers = set(open(FIXTURE_LAYERS).read().split())
    for name, v in bos.items():
        assert name in our_layers, f"{name} not a layer of our UNet"
        assert v.shape == (1, v.shape[-1]) and v.dtype == np.float32


@needs_artifact
def test_bos_artifact_wires_into_deploy(bos_raw):
    """apply_bos_outputs fills deploy entries (incl. the fused to_kv
    concat) from the converted real artifact."""
    from mixdq_tpu.quant.deploy import DeployEntry, apply_bos_outputs
    from mixdq_tpu.utils.torch_convert import convert_bos_precomputed

    bos = convert_bos_precomputed(
        {k: v.numpy() for k, v in bos_raw.items()})
    k_name = next(n for n in bos if n.endswith(".attn2.to_k"))
    prefix = k_name[: -len(".to_k")]
    N = bos[k_name].shape[-1]
    deploy = {
        k_name: DeployEntry(kind="linear"),
        f"{prefix}.to_v": DeployEntry(kind="fused_away"),
        f"{prefix}.to_kv": DeployEntry(kind="linear"),
        "conv_in": DeployEntry(kind="conv"),
    }
    out = apply_bos_outputs(deploy, bos)
    assert out[k_name].bos_out.shape == (1, N)
    np.testing.assert_allclose(np.asarray(out[k_name].bos_out),
                               bos[k_name], rtol=1e-3)
    fused = out[f"{prefix}.to_kv"].bos_out
    assert fused.shape == (1, 2 * N)
    np.testing.assert_allclose(np.asarray(fused),
                               np.concatenate([bos[k_name],
                                               bos[f"{prefix}.to_v"]], 1),
                               rtol=1e-3)
    # fused-away member and non-attn entries untouched
    assert out[f"{prefix}.to_v"].bos_out is None
    assert out["conv_in"].bos_out is None


@needs_artifact
def test_bos_artifact_consistent_with_precompute_shape(bos_raw):
    """Our online precompute (precompute_bos_outputs) and the reference's
    offline artifact agree on the contract: one [1, N] row per to_k/to_v,
    N == the layer's out-features — checked on a synthetic layer with the
    real artifact's dims."""
    from mixdq_tpu.quant.deploy import DeployEntry, precompute_bos_outputs

    name = "down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k"
    assert name in {k if not k.startswith("model.") else k[6:]
                    for k in bos_raw}
    D, N = 2048, 640  # SDXL cross_attention_dim -> 32x32-level inner dim
    rng = np.random.RandomState(0)
    w = rng.randn(D, N).astype(np.float32) * 0.02
    params = {"down_blocks_1": {"attentions_0": {"transformer_blocks_0": {
        "attn2": {"to_k": {"kernel": jnp.asarray(w)}}}}}}
    deploy = {name: DeployEntry(kind="linear")}
    emb = jnp.asarray(rng.randn(D).astype(np.float32))
    out = precompute_bos_outputs(deploy, params, emb)
    got = np.asarray(out[name].bos_out)
    assert got.shape == (1, N) == tuple(
        np.asarray(bos_raw[name]).reshape(1, -1).shape)
    np.testing.assert_allclose(got, (np.asarray(emb)[None, :] @ w),
                               rtol=1e-4, atol=1e-3)
