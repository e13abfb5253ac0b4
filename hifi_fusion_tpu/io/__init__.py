from . import pcd, downloads
