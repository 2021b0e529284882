from sketch2img_tpu.core.schedulers import (
    DiffusionSchedule,
    DPMSolverPlan,
    DDIMPlan,
    make_schedule,
    add_noise,
    get_noise_level,
    plan_dpm_solver,
    dpm_solver_step,
    plan_ddim,
    ddim_step,
)
__all__ = [
    "DiffusionSchedule",
    "DPMSolverPlan",
    "DDIMPlan",
    "make_schedule",
    "add_noise",
    "get_noise_level",
    "plan_dpm_solver",
    "dpm_solver_step",
    "plan_ddim",
    "ddim_step",
]
