from .configs import FAMILIES, ModelFamilyConfig, UNetConfig, get_family
from .unet import UNet2DConditionModel, conv_shortcut_splits
from .vae import AutoencoderKL
from .clip import CLIPTextModel
from .layers import QAct, QConv, QDense
