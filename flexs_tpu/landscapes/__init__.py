"""Ground-truth landscapes and their problem registries."""
from flexs_tpu.landscapes import tf_binding  # noqa: F401
from flexs_tpu.landscapes.tf_binding import TFBinding  # noqa: F401
