"""Plotting helpers (host-side, matplotlib/imageio).

Capability parity with /root/reference/utils/plotting.py: percentile clim
(plotting.py:9-11), 3-panel orthogonal volume view (``explode_volume``,
:14-87), GIF export (:90-111), wiggle seismograms (:114-142) and gather
images (:145-170). Figures are returned (not ``plt.show()``-n) so they work
headless.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def clim(x: np.ndarray, ratio: float = 95) -> Tuple[float, float]:
    c = np.percentile(np.absolute(x), ratio)
    return -c, c


def explode_volume(volume: np.ndarray, t: Optional[int] = None,
                   x: Optional[int] = None, y: Optional[int] = None,
                   figsize: tuple = (8, 8), cmap: str = "bone",
                   clipval: Optional[tuple] = None, p: int = 98,
                   tlim: Optional[tuple] = None, xlim: Optional[tuple] = None,
                   ylim: Optional[tuple] = None,
                   labels=("[s]", "[km]", "[km]"),
                   ratio: Optional[tuple] = None, linespec: Optional[dict] = None,
                   filename: Optional[str] = None,
                   save_opts: Optional[dict] = None):
    """Central/top/right orthogonal slices of a (t, x, y) volume."""
    if linespec is None:
        linespec = dict(ls="-", lw=1, color="orange")
    nt, nx, ny = volume.shape
    t_label, x_label, y_label = labels
    t = t if t is not None else nt // 2
    x = x if x is not None else nx // 2
    y = y if y is not None else ny // 2

    if tlim is None:
        t_label, tlim = "samples", (0, nt)
    if xlim is None:
        x_label, xlim = "samples", (0, nx)
    if ylim is None:
        y_label, ylim = "samples", (0, ny)

    tline = (tlim[1] - tlim[0]) / nt * t + tlim[0]
    xline = (xlim[1] - xlim[0]) / nx * x + xlim[0]
    yline = (ylim[1] - ylim[0]) / ny * y + ylim[0]

    fig = plt.figure(figsize=figsize)
    wr, hr = ((nx, ny), (ny, nx)) if ratio is None else (ratio[0], ratio[1])
    opts = dict(cmap=cmap, clim=clipval if clipval is not None else clim(volume, p),
                aspect="auto")
    gs = fig.add_gridspec(2, 2, width_ratios=wr, height_ratios=hr,
                          left=0.1, right=0.9, bottom=0.1, top=0.9,
                          wspace=0.0, hspace=0.0)
    ax = fig.add_subplot(gs[1, 0])
    ax_top = fig.add_subplot(gs[0, 0], sharex=ax)
    ax_right = fig.add_subplot(gs[1, 1], sharey=ax)

    ax.imshow(volume[:, :, y], extent=[xlim[0], xlim[1], tlim[1], tlim[0]], **opts)
    ax.axvline(x=xline, **linespec)
    ax.axhline(y=tline, **linespec)

    ax_top.imshow(volume[t].T, extent=[xlim[0], xlim[1], ylim[1], ylim[0]], **opts)
    ax_top.axvline(x=xline, **linespec)
    ax_top.axhline(y=yline, **linespec)
    ax_top.invert_yaxis()

    ax_right.imshow(volume[:, x], extent=[ylim[0], ylim[1], tlim[1], tlim[0]], **opts)
    ax_right.axvline(x=yline, **linespec)
    ax_right.axhline(y=tline, **linespec)

    ax_top.tick_params(axis="x", labelbottom=False)
    ax_right.tick_params(axis="y", labelleft=False)
    ax.set_xlabel("x " + x_label)
    ax.set_ylabel("t " + t_label)
    ax_right.set_xlabel("y " + y_label)
    ax_top.set_ylabel("y " + y_label)

    if filename is not None:
        if save_opts is None:
            save_opts = {"format": "png", "dpi": 150, "bbox_inches": "tight"}
        fig.savefig(f"{filename}.{save_opts['format']}", **save_opts)
    return fig


def gif_from_array(x: np.ndarray, filename: str, clipval: Optional[tuple] = None,
                   p: int = 98, axis: int = 0, **kwargs) -> None:
    """Export volume slices along ``axis`` as an animated GIF."""
    from imageio import mimsave

    if clipval is None:
        clipval = clim(x, p)
    if axis > x.ndim:
        raise ValueError("Provided dir has to be an array dimension")
    x = np.clip(x, clipval[0], clipval[1])
    x = (x - clipval[0]) / (clipval[1] - clipval[0])
    x = (x * 255).astype(np.uint8)
    if axis != 0:
        x = np.swapaxes(x, axis, 0)
    frames = [x[i].T for i in range(x.shape[0])]
    mimsave(filename, frames, format="GIF", **kwargs)


def seismograms(x: np.ndarray, ax, tlim: Optional[tuple] = None,
                xlim: Optional[tuple] = None, gain: float = 1.0,
                color: Union[str, Tuple[str, str]] = "black") -> None:
    """Wiggle-trace plot of a (t, x) gather on an existing axis."""
    if isinstance(color, str):
        color = (color, color)
    elif not (isinstance(color, tuple) and len(color) == 2):
        raise ValueError("color has to be a tuple of 2 elements")

    tlim_ = tlim if tlim is not None else (0, x.shape[0])
    xlim_ = xlim if xlim is not None else (1, x.shape[1])
    t_axis = np.linspace(tlim_[0], tlim_[1], x.shape[0])
    x_axis = np.linspace(xlim_[0], xlim_[1], x.shape[1])

    for idx, xx in enumerate(x_axis):
        trace = x[:, idx] * gain + xx
        ax.fill_betweenx(t_axis, trace, xx, where=trace >= xx, facecolor=color[0])
        ax.fill_betweenx(t_axis, trace, xx, where=trace <= xx, facecolor=color[1])

    ax.set_ylim(tlim_[0], tlim_[1])
    ax.invert_yaxis()
    ax.set_xticks(x_axis)
    ax.tick_params(axis="x", size=2, width=1)
    ax.xaxis.set_label_position("top")
    ax.xaxis.set_ticks_position("top")
    ax.grid(visible=True, which="major", axis="y")


def plot_gather(gather: np.ndarray, figsize: tuple = (8, 8), cmap: str = "bone",
                clipval: Optional[tuple] = None, p: int = 98,
                tlim: Optional[tuple] = None, xlim: Optional[tuple] = None,
                labels=("[s]", "[km]"), filename: Optional[str] = None):
    """Image plot of a (t, x) gather."""
    t_label, x_label = labels
    if tlim is None:
        t_label, tlim = "samples", (0, gather.shape[0])
    if xlim is None:
        x_label, xlim = "samples", (0, gather.shape[1])

    fig = plt.figure(figsize=figsize)
    plt.imshow(gather, cmap=cmap, aspect="auto",
               clim=clipval if clipval is not None else clim(gather, p),
               extent=[xlim[0], xlim[1], tlim[1], tlim[0]])
    plt.xlabel("x " + x_label)
    plt.ylabel("t " + t_label)
    if filename is not None:
        fig.savefig(filename, bbox_inches="tight", dpi=150)
    return fig
