from .intersect import trace, mt_select, mt_refine, HitRecord
from .render import render_frame, render_chunk
