from .place_recognition import KeyFrameDatabase, VocabTensor  # noqa: F401
