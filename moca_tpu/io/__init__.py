from moca_tpu.io.prompts import load_prompts  # noqa: F401
from moca_tpu.io.video import (  # noqa: F401
    load_conditioning_image, save_gif, save_video, tensor_to_uint8,
)
