from . import urlnorm, hashes, robots, links, urlfilter  # noqa: F401
