"""Utility subpackage: sequence codecs, replay buffers, generative models."""
from flexs_tpu.alphabet import AAS, BA, DNAA, RNAA  # noqa: F401
from flexs_tpu.utils import sequence_utils  # noqa: F401
