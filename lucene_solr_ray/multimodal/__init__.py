from .codecs import (  # noqa: F401
    decode_bmp,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    image_stats,
    resize_nearest,
    sniff_and_decode,
)
from .ops import (  # noqa: F401
    decode_images,
    decode_images_real,
    extract_image_features,
    sample_frames,
)
