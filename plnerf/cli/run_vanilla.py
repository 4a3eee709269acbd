"""Vanilla-NeRF driver: same task surface as ``run_plnerf`` but with a
single joint Adam over coarse+fine and no constant-init warmup — the
reference ``run_nerf_vanilla.py`` (single optimizer at its create_nerf;
no ``constant_init`` in its render_rays)."""
from __future__ import annotations

from .config import config_parser, resolve_args
from .run_plnerf import run


def main(argv=None):
    args = config_parser().parse_args(argv)
    args = resolve_args(args)
    args.constant_init = 0  # vanilla has no warmup
    run(args, vanilla=True)


if __name__ == "__main__":
    main()
