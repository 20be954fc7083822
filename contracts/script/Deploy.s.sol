// SPDX-License-Identifier: MIT
pragma solidity ^0.8.25;

import {VectorX} from "../src/VectorX.sol";
import {ERC1967Proxy} from "../src/upgrades/ERC1967Proxy.sol";

/// @notice Deploy script (forge): CREATE2 implementation + ERC1967 proxy
///         with env-flag-driven post-deploy state updates, mirroring the
///         reference deploy flow (reference contracts/script/
///         Deploy.s.sol:12-81). Genesis parameters come from
///         `python -m vectorx_tpu.bin.genesis`.
/// Env: CREATE2_SALT, UPGRADE, CONTRACT_ADDRESS (when upgrading),
///      GUARDIAN_ADDRESS, GATEWAY_ADDRESS, GENESIS_HEIGHT, GENESIS_HEADER,
///      GENESIS_AUTHORITY_SET_ID, GENESIS_AUTHORITY_SET_HASH,
///      HEADER_RANGE_FUNCTION_ID, ROTATE_FUNCTION_ID,
///      HEADER_RANGE_COMMITMENT_TREE_SIZE,
///      UPDATE_GATEWAY, UPDATE_GENESIS_STATE, UPDATE_FUNCTION_IDS.
interface Vm {
    function envAddress(string calldata) external returns (address);
    function envUint(string calldata) external returns (uint256);
    function envBytes32(string calldata) external returns (bytes32);
    function envBool(string calldata) external returns (bool);
    function startBroadcast() external;
    function stopBroadcast() external;
}

contract Deploy {
    Vm constant vm = Vm(address(uint160(uint256(keccak256("hevm cheat code")))));

    function run() external returns (address impl, address proxy) {
        bytes32 salt = vm.envBytes32("CREATE2_SALT");
        bool upgrade = vm.envBool("UPGRADE");

        vm.startBroadcast();

        VectorX lightClientImpl = new VectorX{salt: salt}();

        VectorX lightClient;
        if (!upgrade) {
            lightClient = VectorX(
                address(
                    new ERC1967Proxy{salt: salt}(address(lightClientImpl), "")
                )
            );
            lightClient.initialize(
                VectorX.InitParameters({
                    guardian: vm.envAddress("GUARDIAN_ADDRESS"),
                    gateway: vm.envAddress("GATEWAY_ADDRESS"),
                    height: uint32(vm.envUint("GENESIS_HEIGHT")),
                    header: vm.envBytes32("GENESIS_HEADER"),
                    authoritySetId: uint64(
                        vm.envUint("GENESIS_AUTHORITY_SET_ID")
                    ),
                    authoritySetHash: vm.envBytes32(
                        "GENESIS_AUTHORITY_SET_HASH"
                    ),
                    headerRangeFunctionId: vm.envBytes32(
                        "HEADER_RANGE_FUNCTION_ID"
                    ),
                    rotateFunctionId: vm.envBytes32("ROTATE_FUNCTION_ID"),
                    headerRangeCommitmentTreeSize: uint32(
                        vm.envUint("HEADER_RANGE_COMMITMENT_TREE_SIZE")
                    )
                })
            );
        } else {
            // the TIMELOCK_ROLE holder routes this through Timelock.sol's
            // schedule/execute delay in production
            lightClient = VectorX(vm.envAddress("CONTRACT_ADDRESS"));
            lightClient.upgradeTo(address(lightClientImpl));
        }

        if (vm.envBool("UPDATE_GATEWAY")) {
            lightClient.updateGateway(vm.envAddress("GATEWAY_ADDRESS"));
        }
        if (vm.envBool("UPDATE_GENESIS_STATE")) {
            lightClient.updateGenesisState(
                uint32(vm.envUint("GENESIS_HEIGHT")),
                vm.envBytes32("GENESIS_HEADER"),
                uint64(vm.envUint("GENESIS_AUTHORITY_SET_ID")),
                vm.envBytes32("GENESIS_AUTHORITY_SET_HASH")
            );
        }
        if (vm.envBool("UPDATE_FUNCTION_IDS")) {
            lightClient.updateFunctionIds(
                vm.envBytes32("HEADER_RANGE_FUNCTION_ID"),
                vm.envBytes32("ROTATE_FUNCTION_ID"),
                uint32(vm.envUint("HEADER_RANGE_COMMITMENT_TREE_SIZE"))
            );
        }

        vm.stopBroadcast();
        return (address(lightClientImpl), address(lightClient));
    }
}
