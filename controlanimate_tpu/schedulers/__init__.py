"""Functional, scan-friendly diffusion samplers.

Registry names match the reference's scheduler config strings
(reference: modules/controlanimate_pipeline.py:52-73 and
configs/prompts/SampleConfig.yaml `scheduler:`).
"""

from .base import Scheduler, available_schedulers, batch_shared_normal, make_scheduler
from .common import DiffusionSchedule, make_schedule
from .ddim import DDIMScheduler
from .dpm import DPMSolverMultistepScheduler
from .euler import EulerAncestralDiscreteScheduler, EulerDiscreteScheduler
from .lcm import LCMScheduler
from .lms import LMSDiscreteScheduler
from .pndm import PNDMScheduler

__all__ = [
    "Scheduler",
    "DiffusionSchedule",
    "make_schedule",
    "make_scheduler",
    "available_schedulers",
    "DDIMScheduler",
    "DPMSolverMultistepScheduler",
    "EulerDiscreteScheduler",
    "EulerAncestralDiscreteScheduler",
    "LCMScheduler",
    "LMSDiscreteScheduler",
    "PNDMScheduler",
]
