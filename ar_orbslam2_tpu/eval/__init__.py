from .trajectory import save_tum, load_tum, save_kitti, load_kitti  # noqa: F401
from .ate import align_umeyama, ate_rmse, rpe  # noqa: F401
