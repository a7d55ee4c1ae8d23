from moca_tpu.eval.metrics import psnr, ssim, temporal_lpips_proxy  # noqa: F401
