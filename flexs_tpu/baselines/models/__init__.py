"""Baseline surrogate models (noisy oracles and empirical regressors)."""
from flexs_tpu.baselines.models.adaptive_ensemble import (  # noqa: F401
    AdaptiveEnsemble,
    r2_weights,
)
from flexs_tpu.baselines.models.cnn import CNN  # noqa: F401
from flexs_tpu.baselines.models.flax_model import FlaxModel  # noqa: F401
from flexs_tpu.baselines.models.global_epistasis_model import (  # noqa: F401
    GlobalEpistasisModel,
)
from flexs_tpu.baselines.models.jax_gp import (  # noqa: F401
    JaxGaussianProcessRegressor,
    JaxKNNRegressor,
)
from flexs_tpu.baselines.models.jax_trees import (  # noqa: F401
    JaxExtraTree,
    JaxGradientBoosting,
    JaxRandomForest,
)
from flexs_tpu.baselines.models.jax_linear import (  # noqa: F401
    JaxBayesianRidge,
    JaxLasso,
    JaxRidgeRegression,
)
from flexs_tpu.baselines.models.mlp import MLP  # noqa: F401
from flexs_tpu.baselines.models.noisy_abstract_model import (  # noqa: F401
    NoisyAbstractModel,
)
from flexs_tpu.baselines.models.sklearn_models import (  # noqa: F401
    LinearRegression,
    LogisticRegression,
    RandomForest,
    SklearnClassifier,
    SklearnModel,
    SklearnRegressor,
)

# Alias for users migrating from the reference's TF/Keras stack: the Flax
# wrapper fills the same role as flexs.baselines.models.KerasModel.
KerasModel = FlaxModel
