from .instances import GTInstances, Proposals, Detections, ImageBatch

__all__ = ["GTInstances", "Proposals", "Detections", "ImageBatch"]
