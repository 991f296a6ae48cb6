from msa_tpu.utils.logging_config import setup_logging  # noqa: F401
from msa_tpu.utils.misc import create_directories  # noqa: F401
