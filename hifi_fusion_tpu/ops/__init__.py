from . import geometry, hashing, eigen33
from .integrate import integrate_frame
from .refine import refine_pass
from .extract import extract, ExtractResult, to_host
