from .ppm import write_ppm, save_ppm, ppm_bytes, read_ppm, image_to_u8
