"""Host-side I/O: SER/AVI demuxers, FITS/PNG writers, synthetic scans."""

from .ser import SerHeader, SerReader, write_ser  # noqa: F401
from .video import VideoReader, open_video  # noqa: F401
from .fits import write_fits, read_fits, make_header  # noqa: F401
from .png import write_png, read_image  # noqa: F401
