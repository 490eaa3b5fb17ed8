"""ASCII rendering of a warehouse state (SURVEY.md C14).

Capability parity with the reference's ``render()`` (exact medium unknown
— mount empty, SURVEY.md §0; ASCII chosen as the dependency-free option).

Legend:
  .   empty floor          p   pending pickup cell
  #   wall/shelf
  d   drop cell of an active (assigned or in-transit) request
  0-9 agent index (uppercase hex letter if carrying: A=agent 10 is not
      supported beyond 36 agents)
  *   agent standing on a request cell
"""

from __future__ import annotations

import numpy as np

from ..config import EnvConfig

PENDING, IN_TRANSIT = 1, 2


def render_ascii(cfg: EnvConfig, state) -> str:
    """state: EnvState or OracleState (any pytree with numpy-able fields)."""
    pos = np.asarray(state.agent_pos)
    carrying = np.asarray(state.carrying)
    rp = np.asarray(state.req_pickup)
    rd = np.asarray(state.req_drop)
    st = np.asarray(state.req_status)

    grid = np.full((cfg.height, cfg.width), ".", dtype="<U2")
    for w in cfg.walls:
        grid[w // cfg.width, w % cfg.width] = "#"
    for r in range(cfg.queue_capacity):
        if st[r] == PENDING:
            grid[rp[r, 0], rp[r, 1]] = "p"
    for r in range(cfg.queue_capacity):
        if st[r] in (PENDING, IN_TRANSIT):
            cell = grid[rd[r, 0], rd[r, 1]]
            grid[rd[r, 0], rd[r, 1]] = "d" if cell == "." else "*"
    for i in range(cfg.num_agents):
        ch = format(i, "x")
        if carrying[i]:
            ch = ch.upper()
        cell = grid[pos[i, 0], pos[i, 1]]
        grid[pos[i, 0], pos[i, 1]] = ch if cell == "." else ch
    border = "+" + "-" * cfg.width + "+"
    rows = ["|" + "".join(row) + "|" for row in grid]
    t = int(np.asarray(state.t))
    return "\n".join([f"t={t}", border, *rows, border])
