from moca_tpu.pipelines.t2v import T2VPipeline  # noqa: F401
from moca_tpu.pipelines.moca_video import MoCAVideoPipeline  # noqa: F401
