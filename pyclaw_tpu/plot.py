"""Minimal frame plotting (reference ``src/pyclaw/plot.py`` :~1-90).

The reference delegates to the external visclaw package; here we provide a
small matplotlib-based frame plotter covering the common cases (1D line
plots, 2D pcolormesh) plus the same entry-point names.
"""

from __future__ import annotations

import os


def _load_frames(outdir="./_output", file_format="ascii"):
    from .solution import Solution
    frames = []
    i = 0
    while True:
        try:
            frames.append(Solution(i, path=outdir, file_format=file_format))
        except FileNotFoundError:
            break
        i += 1
    return frames


def plot_frame(solution, component=0, ax=None):
    import matplotlib.pyplot as plt
    if ax is None:
        _, ax = plt.subplots()
    q = solution.q
    grid = solution.domain.grid
    if solution.domain.num_dim == 1:
        ax.plot(grid.dimensions[0].centers, q[component])
    elif solution.domain.num_dim == 2:
        x, y = grid.c_centers
        ax.pcolormesh(x, y, q[component], shading="auto")
    else:
        raise NotImplementedError("3D plotting: slice manually")
    ax.set_title(f"t = {solution.t:.4f}")
    return ax


def html_plot(outdir="./_output", file_format="ascii", component=0):
    """Write one PNG per frame + an index.html into <outdir>/_plots."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    frames = _load_frames(outdir, file_format)
    plotdir = os.path.join(outdir, "_plots")
    os.makedirs(plotdir, exist_ok=True)
    names = []
    for i, sol in enumerate(frames):
        fig, ax = plt.subplots()
        plot_frame(sol, component, ax)
        name = f"frame{i:04d}.png"
        fig.savefig(os.path.join(plotdir, name), dpi=100)
        plt.close(fig)
        names.append(name)
    with open(os.path.join(plotdir, "index.html"), "w") as f:
        f.write("<html><body>\n")
        for name in names:
            f.write(f'<img src="{name}"><br>\n')
        f.write("</body></html>\n")
    return plotdir


def interactive_plot(outdir="./_output", file_format="ascii", setplot=None):
    import matplotlib.pyplot as plt
    frames = _load_frames(outdir, file_format)
    for sol in frames:
        plot_frame(sol)
    plt.show()
