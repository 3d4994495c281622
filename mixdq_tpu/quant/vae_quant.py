"""Int8 VAE decoder quantization — TPU surface beyond parity.

The reference quantizes only the UNet and runs the VAE in fp16
(kernels/quantize_sdxl.py:31-37). In few-step regimes — MixDQ's actual
target (SDXL-Turbo 1-step, SD1.5+LCM 4-step) — VAE decode dominates the
end-to-end latency, so the remaining pipeline-level lever is an int8
decoder: same calibrate -> deploy machinery as the UNet, driven over the
``decoder.*`` layer subtree of ``models.vae.AutoencoderKL``. Oversized
feature maps (512x512 level) fall back from the Pallas conv kernels to
XLA s8 convs automatically (``ops.pallas_qconv.conv_fits_vmem``).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

from .calibrate import calibrate
from .core import QuantSpec
from .deploy import deploy_unet_ctx, deployed_params
from .state import QuantCtx, quantizable_layers, uniform_ctrl


class _DecodeAdapter:
    """calibrate()-compatible view of the VAE: apply == decode."""

    def __init__(self, vae):
        self._vae = vae

    def apply(self, variables, z, ctx, **kw):
        return self._vae.apply(variables, z, ctx, method="decode", **kw)


def quantize_vae_decoder(
    vae,
    variables: Dict[str, Any],
    latent_batches: Iterable[Any],
    wq: QuantSpec = None,
    aq: QuantSpec = None,
    deploy_compute: str = "int8_sec",
) -> Tuple[Dict[str, Any], QuantCtx]:
    """Calibrate + deploy the VAE decoder to int8.

    ``latent_batches``: iterable of scaled-latent arrays ([B, h, w, 4] as
    fed to ``decode``) — e.g. sampler outputs or random normals scaled by
    the latent std. Returns ``(pruned_variables, ctx)``; run with
    ``vae.apply(pruned, z, ctx, method="decode")``.
    """
    wq = wq or QuantSpec(sym=True, channel_wise=True, round_mode="nearest")
    aq = aq or QuantSpec(running_stat=True)
    qparams = calibrate(_DecodeAdapter(vae), variables,
                        [(z,) for z in latent_batches], wq, aq)
    names = [n for n in quantizable_layers(variables["params"])
             if n.startswith("decoder.")]
    ctrl = uniform_ctrl(names, w_bits=8, a_bits=8)
    ctx = deploy_unet_ctx(vae, variables, qparams, ctrl, wq, aq,
                          bos_aware=False)
    ctx = ctx.replace(deploy_compute=deploy_compute)
    return deployed_params(variables, ctx), ctx
