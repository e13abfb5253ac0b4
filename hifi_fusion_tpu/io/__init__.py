from . import pcd, ply, downloads
