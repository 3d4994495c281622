from . import qops
from .qops import qconv2d, qlinear, quantize_per_tensor
