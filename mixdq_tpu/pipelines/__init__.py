from .txt2img import PipelineOutput, Text2ImgPipeline
from .serving import ServingEngine
from . import samplers
