from . import native
from .decode import CloudFrame, PointField, decode_frame, make_cloud_frame
from .session import FusionSession
from .sources import ReplaySource, SyntheticSource, Source, save_sweep, load_sweep
