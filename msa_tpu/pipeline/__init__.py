from msa_tpu.pipeline.graph import (  # noqa: F401
    PipelineModels,
    SegmentInputs,
    SegmentPipeline,
)
