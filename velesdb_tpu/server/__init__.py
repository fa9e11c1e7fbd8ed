"""REST surface (``velesdb-server`` counterpart, SURVEY.md §2.6)."""

from velesdb_tpu.server.app import VelesServer, make_server, serve

__all__ = ["VelesServer", "make_server", "serve"]
