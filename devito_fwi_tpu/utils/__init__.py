from . import fd, filters
