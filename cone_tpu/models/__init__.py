from cone_tpu.models.cone import ConeModel
from cone_tpu.models.transformer import DetrTransformer
