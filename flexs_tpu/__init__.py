"""flexs_tpu: a TPU-native fitness-landscape exploration sandbox.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of FLEXS
(the Fitness Landscape EXploration Sandbox): ground-truth landscapes as
device kernels, surrogate models as Flax modules trained under jit, and
explorers as batched device programs — with the same public API surface:

    import flexs_tpu as flexs
    problem = flexs.landscapes.tf_binding.registry()["SIX6_REF_R1"]
    landscape = flexs.landscapes.TFBinding(**problem["params"])
    model = flexs.baselines.models.NoisyAbstractModel(landscape)
    explorer = flexs.baselines.explorers.Adalead(
        model, rounds=10, sequences_batch_size=100,
        model_queries_per_batch=2000,
        starting_sequence=problem["starts"][0], alphabet=flexs.utils.DNAA)
    df, metadata = explorer.run(landscape)
"""

__version__ = "0.1.0"

from flexs_tpu import types  # noqa: F401
from flexs_tpu.alphabet import AAS, BA, DNAA, RNAA, Alphabet  # noqa: F401
from flexs_tpu.landscape import Landscape  # noqa: F401
from flexs_tpu.model import LandscapeAsModel, Model  # noqa: F401
from flexs_tpu.ensemble import Ensemble  # noqa: F401
from flexs_tpu.explorer import Explorer  # noqa: F401

from flexs_tpu import baselines, evaluate, landscapes, utils  # noqa: F401
from flexs_tpu import ops, parallel, rl, runtime  # noqa: F401
