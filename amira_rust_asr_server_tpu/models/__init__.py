"""Model family: conformer encoder, LSTM prediction net, joint network.

The three-model trio of the reference (preprocessor/encoder/decoder_joint,
ref: model-repo/) as in-process JAX modules sharing one parameter pytree.
"""

from .aed import AEDModel
from .ctc import CTCModel
from .decoder_joint import (init_joint_params, init_pred_params,
                            init_pred_state, joint_full, joint_step,
                            pred_forward, pred_step)
from .encoder import ConformerEncoder
from .presets import BASE, LARGE, PRESETS, TINY, ModelConfig, get_preset
from .transducer import Transducer

__all__ = [
    "ConformerEncoder", "Transducer", "CTCModel", "AEDModel", "ModelConfig",
    "get_preset",
    "PRESETS", "TINY", "BASE", "LARGE",
    "init_pred_params", "init_joint_params", "init_pred_state",
    "pred_step", "pred_forward", "joint_step", "joint_full",
]
