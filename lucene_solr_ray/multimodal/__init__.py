from .codecs import (  # noqa: F401
    decode_bmp,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    image_stats,
    resize_nearest,
    sniff_and_decode,
)
from .audio import (  # noqa: F401
    audio_features,
    decode_wav,
    encode_wav,
    sniff_and_decode_audio,
)
from .ops import (  # noqa: F401
    decode_audio_real,
    decode_images,
    decode_images_real,
    extract_image_features,
    sample_frames,
)
