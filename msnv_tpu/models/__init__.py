from msnv_tpu.models.samplernn import (
    init_params, init_tier_state, predictor_apply, sequence_nll_loss_bits,
)
