"""Ground-truth landscapes and their problem registries."""
from flexs_tpu.landscapes import additive_aav_packaging  # noqa: F401
from flexs_tpu.landscapes import bert_gfp, rna, rosetta, tf_binding  # noqa: F401
from flexs_tpu.landscapes.bert_gfp import BertGFPBrightness  # noqa: F401
from flexs_tpu.landscapes.additive_aav_packaging import (  # noqa: F401
    AdditiveAAVPackaging,
)
from flexs_tpu.landscapes.rna import RNABinding, RNAFolding  # noqa: F401
from flexs_tpu.landscapes.rosetta import RosettaFolding  # noqa: F401
from flexs_tpu.landscapes.tf_binding import TFBinding  # noqa: F401
