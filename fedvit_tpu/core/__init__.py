from fedvit_tpu.core.config import Config, load_config  # noqa: F401
