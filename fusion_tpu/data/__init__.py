from fusion_tpu.data.preprocessor import TextPreprocessor

__all__ = ["TextPreprocessor"]
