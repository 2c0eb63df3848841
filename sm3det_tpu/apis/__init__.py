from .inference import inference_detector_by_patches

__all__ = ["inference_detector_by_patches"]
