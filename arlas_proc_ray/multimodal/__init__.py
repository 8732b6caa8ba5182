from arlas_proc_ray.multimodal.binary import (
    DecodeImageStub,
    FakeFeatureExtractor,
    frame_sample_plan,
    with_binary_metadata,
)

__all__ = [
    "with_binary_metadata",
    "DecodeImageStub",
    "FakeFeatureExtractor",
    "frame_sample_plan",
]
