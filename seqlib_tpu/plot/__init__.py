from .seqplot import PlottedRead, PlottedReadLine, SeqPlot

__all__ = ["PlottedRead", "PlottedReadLine", "SeqPlot"]
