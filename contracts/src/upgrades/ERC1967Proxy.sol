// SPDX-License-Identifier: MIT
pragma solidity ^0.8.25;

/// @notice Minimal ERC-1967 delegate proxy.
///
/// @dev Stand-in for `@openzeppelin/proxy/ERC1967/ERC1967Proxy.sol` as the
///      reference deploy script uses it (reference
///      contracts/script/Deploy.s.sol:6,25-29): constructor stores the
///      implementation in the ERC-1967 slot and optionally delegatecalls an
///      init payload; every later call is delegated to that implementation.
///      Upgrades happen when the implementation (TimelockedUpgradeable)
///      rewrites the slot via `upgradeTo`.
contract ERC1967Proxy {
    /// @dev bytes32(uint256(keccak256("eip1967.proxy.implementation")) - 1)
    bytes32 internal constant _IMPLEMENTATION_SLOT =
        0x360894a13ba1a3210667c828492db98dca3e2076cc3735a920a3ca505d382bbc;

    error ImplementationNotContract();
    error InitializationFailed();

    constructor(address _implementation, bytes memory _data) payable {
        if (_implementation.code.length == 0) {
            revert ImplementationNotContract();
        }
        bytes32 slot = _IMPLEMENTATION_SLOT;
        assembly {
            sstore(slot, _implementation)
        }
        if (_data.length > 0) {
            (bool ok,) = _implementation.delegatecall(_data);
            if (!ok) revert InitializationFailed();
        }
    }

    fallback() external payable {
        _delegate();
    }

    receive() external payable {
        _delegate();
    }

    function _delegate() internal {
        bytes32 slot = _IMPLEMENTATION_SLOT;
        assembly {
            let impl := sload(slot)
            calldatacopy(0, 0, calldatasize())
            let ok := delegatecall(gas(), impl, 0, calldatasize(), 0, 0)
            returndatacopy(0, 0, returndatasize())
            switch ok
            case 0 { revert(0, returndatasize()) }
            default { return(0, returndatasize()) }
        }
    }
}
