from sonar_tpu.models.mutox.model import (  # noqa: F401
    MutoxClassifier,
    MutoxConfig,
    create_mutox_model,
    mutox_archs,
    mutox_params_from_torch,
)
