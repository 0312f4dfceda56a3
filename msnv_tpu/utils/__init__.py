from msnv_tpu.utils.logging import tee_stdout, init_random_seed
