"""On-device runtime: fully-jitted run loops and sharded sweep engines."""
from flexs_tpu.runtime.bo_runner import (  # noqa: F401
    DeviceBONAM,
    run_bo_nam,
)
from flexs_tpu.runtime.cbas_runner import (  # noqa: F401
    DeviceCbASNAM,
    VAEConfig,
    run_cbas_nam,
)
from flexs_tpu.runtime.cmaes_runner import (  # noqa: F401
    DeviceCMAESNAM,
    run_cmaes_nam,
)
from flexs_tpu.runtime.dqn_runner import (  # noqa: F401
    DeviceDQNNAM,
    run_dqn_nam,
)
from flexs_tpu.runtime.dyna_ppo_runner import (  # noqa: F401
    DeviceDynaPPONAM,
    run_dyna_ppo_nam,
)
from flexs_tpu.runtime.dyna_ppo_mutative_runner import (  # noqa: F401
    DeviceDynaPPOMutativeNAM,
    run_dyna_ppo_mutative_nam,
)
from flexs_tpu.runtime.gpr_bo_runner import (  # noqa: F401
    DeviceGPRBONAM,
    run_gpr_bo_nam,
)
from flexs_tpu.runtime.ga_runner import (  # noqa: F401
    DeviceGeneticAlgorithmNAM,
    run_ga_nam,
)
from flexs_tpu.runtime.ppo_runner import (  # noqa: F401
    DevicePPONAM,
    run_ppo_nam,
)
from flexs_tpu.runtime.random_runner import (  # noqa: F401
    DeviceRandomNAM,
    run_random_nam,
)
from flexs_tpu.runtime.jit_runner import (  # noqa: F401
    AdaleadConfig,
    DeviceAdaleadNAM,
    run_adalead_nam,
)
