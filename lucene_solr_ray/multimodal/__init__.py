from .ops import decode_images, extract_image_features, sample_frames  # noqa: F401
