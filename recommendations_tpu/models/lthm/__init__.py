from recommendations_tpu.models.lthm.config import LTHMModelConfig
from recommendations_tpu.models.lthm.wrapper import LTHMModelWrapper
from recommendations_tpu.models.lthm.builder import LTHMModelBuilder
