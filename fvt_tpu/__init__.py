"""fvt_tpu — TPU-native feature-based compound multimodal emotion recognition.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
feature-vs-text-compound-emotion reference (training + evaluation of the
LFAN/CAN/JMT/MT fusion models over per-frame video/audio/text feature
streams, the metric & model-selection contract, windowed long-video
inference, and the offline preprocessing pipeline).
"""

__version__ = '0.1.0'
