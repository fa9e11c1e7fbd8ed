"""``python -m velesdb_tpu.server <data_dir> [--host H] [--port P]``."""

import argparse

from velesdb_tpu.server.app import serve


def main() -> None:
    p = argparse.ArgumentParser(prog="velesdb_tpu.server")
    p.add_argument("data_dir", help="database directory")
    p.add_argument("--host", default=None)
    p.add_argument("--port", type=int, default=None)
    args = p.parse_args()
    serve(args.data_dir, args.host, args.port)


if __name__ == "__main__":
    main()
