from sonar_tpu.models.blaser.model import (  # noqa: F401
    BlaserConfig,
    BlaserModel,
    blaser_archs,
    blaser_params_from_torch,
    create_blaser_model,
)
