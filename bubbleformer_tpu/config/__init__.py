from bubbleformer_tpu.config.loader import DEFAULT_CONFIG_DIR, GROUPS, load_config

__all__ = ["DEFAULT_CONFIG_DIR", "GROUPS", "load_config"]
