from mrn_tpu.models.composer import Extractor, Recognizer, build_recognizer

__all__ = ["Extractor", "Recognizer", "build_recognizer"]
