#include "mini_assimp.h"
