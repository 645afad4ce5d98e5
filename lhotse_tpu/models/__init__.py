from lhotse_tpu.models.encoder import (
    EncoderConfig, forward, init_params, make_adamw_train_step, masked_prediction_loss,
    param_shardings, sgd_train_step)

__all__ = [
    "EncoderConfig", "forward", "init_params", "make_adamw_train_step", "masked_prediction_loss",
    "param_shardings", "sgd_train_step"]
