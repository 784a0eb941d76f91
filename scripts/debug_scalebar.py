"""Manual visual test for plotting.add_scalebar (reference
debug_scalebar.py equivalent): renders scalebars in several corners and
scales onto an Agg canvas and saves a png.

Run: python scripts/debug_scalebar.py [out.png]
"""

import sys

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np

from poor_man_gplvm_tpu.plotting import add_scalebar


def main(out="debug_scalebar.png"):
    fig, axs = plt.subplots(2, 2, figsize=(8, 6))
    t = np.linspace(0, 10, 500)
    corners = [(0.1, 0.1), (0.7, 0.1), (0.1, 0.85), (0.7, 0.85)]
    for ax, (x0, y0) in zip(axs.ravel(), corners):
        ax.plot(t, np.sin(t))
        add_scalebar(ax, x0, y0, 0.2, label="2 s")
        ax.set_title(f"scalebar at ({x0}, {y0})")
    fig.tight_layout()
    fig.savefig(out, dpi=100)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
