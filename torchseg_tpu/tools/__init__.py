from .stats import model_stats, print_stats
from .speed import compute_speed
