# Submodules are imported lazily by callers (models.bert / models.mico are
# built on models.eva_vit; keep this namespace import-light).
