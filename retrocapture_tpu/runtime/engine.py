"""Engine stub — fleshed out as the runtime lands."""


class Engine:  # pragma: no cover - placeholder
    pass
