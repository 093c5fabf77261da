"""TPU-native GCANet-class primitive segmentation framework."""

__version__ = "0.1.0"
