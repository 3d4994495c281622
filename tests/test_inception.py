"""InceptionV3 FID feature extractor: forward shape + BN-fold converter
correctness vs torch (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mixdq_tpu.models.inception import BasicConv2d, InceptionV3Features
from mixdq_tpu.utils import torch_convert
import pytest  # noqa: E402


@pytest.mark.slow
def test_inception_forward_shape():
    model = InceptionV3Features()
    img = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    feats = jax.jit(model.apply)(variables, img)
    assert feats.shape == (1, 2048)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_bn_fold_matches_torch():
    import torch

    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 8, 3, stride=2, bias=False)
    bn = torch.nn.BatchNorm2d(8, eps=1e-3)
    bn.eval()
    with torch.no_grad():
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_(1.0, 0.2)
        bn.bias.normal_(0, 0.2)
        x = torch.randn(2, 3, 11, 11)
        want = bn(conv(x)).numpy()

    sd = {
        "Conv2d_1a_3x3.conv.weight": conv.weight.detach().numpy(),
        "Conv2d_1a_3x3.bn.weight": bn.weight.detach().numpy(),
        "Conv2d_1a_3x3.bn.bias": bn.bias.detach().numpy(),
        "Conv2d_1a_3x3.bn.running_mean": bn.running_mean.numpy(),
        "Conv2d_1a_3x3.bn.running_var": bn.running_var.numpy(),
    }
    params = torch_convert.convert_inception_state_dict(sd)

    mod = BasicConv2d(8, (3, 3), strides=(2, 2))
    got = mod.apply({"params": params["Conv2d_1a_3x3"]},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    # BasicConv2d applies relu; compare against relu'd torch output
    np.testing.assert_allclose(np.asarray(got),
                               np.maximum(want.transpose(0, 2, 3, 1), 0.0),
                               atol=1e-4)
