from msa_tpu.processors.offline import OfflineProcessor  # noqa: F401
from msa_tpu.processors.streaming import StreamingProcessor  # noqa: F401
