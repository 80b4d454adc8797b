from inpaintnet_tpu.utils.rng import RngStream
