from .auth import (  # noqa: F401
    Permission,
    Role,
    SecurityManager,
    User,
    require_permission,
    require_role,
)
