from .core import (QuantSpec, fake_quant, fake_quant_channelwise,
                   fit_qparams_grid_search_lp, fit_qparams_minmax,
                   fit_weight_qparams, lp_loss, round_ste, tensor_minmax)
from .state import (LayerCtrl, LayerQParams, QuantCtx, apply_bitwidth_config,
                    canonical_name, group_ctrl, make_ctrl, protect_layers,
                    quantizable_layers, solo_layer_ctrl, uniform_ctrl)
from . import calibrate
from .checkpoint import load_qparams, save_qparams
